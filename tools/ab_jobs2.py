"""Job-stream kernel shape A/B on the spheres bounce population (real TPU).

Isolates the kernel half (the 26 ms sort+cull prefix is common):
  pb4      — g=128, batch 4 / depth 8 (round-5 first cut)
  pb8      — g=128, batch 8 / depth 16 (half the DMA-wait rounds)
  g256     — g=256, batch 4
  norow    — g=128 pb4 without the in-kernel row fetch (isolates the
             per-commit one-hot fetch cost at M=128)
  scannr   — _run2 without rows (the same isolation for the scan kernel)

Run: python tools/ab_jobs2.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import build, tunnel_rt  # noqa: E402
import webgpu_raytracer_tpu.ops.pallas_dense as pd  # noqa: E402
from webgpu_raytracer_tpu.ops.tune import TuneConfig  # noqa: E402
from tools.debug_spheres import bounce_population  # noqa: E402


def main():
    tunnel_rt()
    world, wt, scene, camera = build("spheres")
    R = 512 * 512
    o, d, tm = bounce_population(wt, camera)
    act = jnp.ones(R, bool)

    def jobs(tune, with_row=True):
        def f(o, d, tm):
            out = pd._run3(wt, o, d, tm, act, 1e-3, False, with_row,
                           tune=tune)
            return out[0].sum()
        return jax.jit(f)

    fns = {
        "pb4": jobs(TuneConfig(narrow="jobs", m_tile3=128)),
        "pb8": jobs(TuneConfig(narrow="jobs", m_tile3=128,
                               proc_batch=8, prefetch_depth=16)),
        "g256": jobs(TuneConfig(narrow="jobs", m_tile3=256)),
        "norow": jobs(TuneConfig(narrow="jobs", m_tile3=128),
                      with_row=False),
        "scannr": jax.jit(lambda o, d, tm: pd._run2(
            wt, o, d, tm, act, 1e-3, False, False)[0].sum()),
    }
    for name, f in fns.items():
        np.asarray(f(o, d, tm))
        print(f"compiled {name}", flush=True)

    for rnd in range(4):
        line = []
        for name, f in fns.items():
            t0 = time.perf_counter()
            for _ in range(5):
                out = f(o, d, tm)
            np.asarray(out)
            line.append(f"{name}: {(time.perf_counter() - t0) / 5 * 1e3:7.2f} ms")
        print(f"round {rnd}: " + "   ".join(line), flush=True)


if __name__ == "__main__":
    main()
