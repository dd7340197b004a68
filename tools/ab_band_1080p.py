"""A/B: cornell 1080p d8 with and without row-band strip-mining.

Run on the TPU: python tools/ab_band_1080p.py [width height [depth]]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import build, measure, tunnel_rt  # noqa: E402
import webgpu_raytracer_tpu.ops.dense_trace as dt  # noqa: E402
from webgpu_raytracer_tpu.ops.tune import TuneConfig  # noqa: E402


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    rt = tunnel_rt()
    world, wt, scene, camera = build("cornell", width=w, height=h)

    mode = sys.argv[4] if len(sys.argv) > 4 else "band"
    if mode == "tail":
        # Sweep tail-compaction schedules. "off" = compaction disabled.
        variants = [("off", ()), ("d4/8", ((4, 8),)), ("d5/8", ((5, 8),)),
                    ("d6/8", ((6, 8),)), ("d3/4+d5/16", ((3, 4), (5, 16))),
                    ("d5/16", ((5, 16),))]
        for name, stages in variants:
            tune = TuneConfig(tail_stages=stages)
            t0 = time.perf_counter()
            v, mean_rad, rpf = measure(wt, scene, camera, w, h, 1, depth,
                                       8, rt, tune=tune)
            print(f"tail {name}: {v:.2f} Mrays/s  mean={mean_rad:.4f} "
                  f"(wall {time.perf_counter()-t0:.0f}s)", flush=True)
        return
    if mode == "axis":
        for axis in ("rows", "cols"):
            tune = TuneConfig(band_axis=axis)
            t0 = time.perf_counter()
            v, mean_rad, rpf = measure(wt, scene, camera, w, h, 1, depth,
                                       8, rt, tune=tune)
            print(f"axis {axis}: {v:.2f} Mrays/s  mean={mean_rad:.4f} "
                  f"(wall {time.perf_counter()-t0:.0f}s)", flush=True)
        return
    for name, target in (("banded-10", 210000), ("banded-12", 175000),
                         ("banded-15", 140000), ("banded-18", 115200),
                         ("banded-24", 86500), ("banded-36", 57600),
                         ("banded-54", 38400)):
        tune = TuneConfig(band_target=target)
        nb = dt._pick_bands(w, h, tune)
        t0 = time.perf_counter()
        v, mean_rad, rpf = measure(wt, scene, camera, w, h, 1, depth, 8, rt,
                                   tune=tune)
        print(f"{name}: bands={nb} {v:.2f} Mrays/s  mean={mean_rad:.4f} "
              f"rays/frame={rpf/1e6:.2f}M  (wall {time.perf_counter()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
