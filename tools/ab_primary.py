"""Attribute the spheres depth-1 frame (394 ms measured, round 5).

Times, interleaved, all at 512^2 on the real TPU:
  d1        — full trace_pixels_dense depth-1 frame (jobs narrow)
  d1scan    — same with the scan kernel
  psweep    — _run3 closest+rows on the primary CAMERA rays alone
  psweep_sc — _run2 closest+rows on the same rays
  rgen      — ray generation only (the jnp prefix before the sweep)

Run: python tools/ab_primary.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import build, tunnel_rt  # noqa: E402
import webgpu_raytracer_tpu.ops.pallas_dense as pd  # noqa: E402
from webgpu_raytracer_tpu.ops.dense_trace import trace_pixels_dense  # noqa: E402
from webgpu_raytracer_tpu.ops.tune import TuneConfig  # noqa: E402


def camera_rays(camera, R=512 * 512):
    c = camera
    lane = jnp.arange(R, dtype=jnp.uint32)
    px = (lane % 512).astype(jnp.float32)
    py = (lane // 512).astype(jnp.float32)
    u = (px + 0.5) / 512
    v = 1.0 - (py + 0.5) / 512
    po = tuple(jnp.broadcast_to(c[i], (R,)) for i in range(3))
    pdir = (c[4] + u * c[8] + v * c[12] - c[0],
            c[5] + u * c[9] + v * c[13] - c[1],
            c[6] + u * c[10] + v * c[14] - c[2])
    return po, pdir


def main():
    tunnel_rt()
    world, wt, scene, camera = build("spheres")
    R = 512 * 512
    po, pdir = camera_rays(camera)
    act = jnp.ones(R, bool)
    jobs = TuneConfig(narrow="jobs")

    def frame(tune):
        return jax.jit(lambda wt, tex, cam: trace_pixels_dense(
            wt, tex, cam, jnp.int32(1), jnp.zeros(2, jnp.float32),
            512, 512, 1, 1, tune=tune)[0].mean())

    fns = {
        "d1": frame(jobs),
        "d1scan": frame(TuneConfig()),
        "psweep": jax.jit(lambda o, d: pd._run3(
            wt, o, d, 1e30, act, 1e-3, False, True, tune=jobs)[0].sum()),
        "psweep_sc": jax.jit(lambda o, d: pd._run2(
            wt, o, d, 1e30, act, 1e-3, False, True)[0].sum()),
    }
    args = {
        "d1": (wt, scene.textures, camera),
        "d1scan": (wt, scene.textures, camera),
        "psweep": (po, pdir),
        "psweep_sc": (po, pdir),
    }
    for name, f in fns.items():
        np.asarray(f(*args[name]))
        print(f"compiled {name}", flush=True)

    for rnd in range(4):
        line = []
        for name, f in fns.items():
            t0 = time.perf_counter()
            for _ in range(5):
                out = f(*args[name])
            np.asarray(out)
            line.append(f"{name}: {(time.perf_counter() - t0) / 5 * 1e3:7.2f} ms")
        print(f"round {rnd}: " + "   ".join(line), flush=True)


if __name__ == "__main__":
    main()
