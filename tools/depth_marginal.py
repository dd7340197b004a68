"""Marginal per-bounce cost of the spheres frame (real TPU).

Times the full chained frame at max_depth 1, 2, 4, 8 (each its own jit
entry, interleaved) — the marginals attribute frame time to bounce depth
ranges and bound what per-bounce optimizations can recover.

Run: python tools/depth_marginal.py [scene [w h]]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import build, tunnel_rt  # noqa: E402
from webgpu_raytracer_tpu.ops.dense_trace import trace_pixels_dense  # noqa: E402
from webgpu_raytracer_tpu.ops.tune import TuneConfig  # noqa: E402
import os
TUNE = TuneConfig(narrow="jobs") if os.environ.get("WRT_JOBS") else TuneConfig()


def main():
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "spheres"
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    tunnel_rt()
    world, wt, scene, camera = build(scene_name, width=w, height=h)

    fns = {}
    rays = {}
    for d in (1, 2, 4, 8):
        def fn(wt, tex, cam, n, d=d):
            def body(i, acc):
                s, r = acc
                col, rr = trace_pixels_dense(
                    wt, tex, cam, i + 1, jnp.zeros(2, jnp.float32),
                    w, h, 1, d, with_stats=True, tune=TUNE)
                return s + col.mean(), r + rr
            return jax.lax.fori_loop(0, n, body,
                                     (jnp.zeros(()), jnp.zeros(())))
        jf = jax.jit(fn, static_argnums=(3,))
        jax.block_until_ready(jf(wt, scene.textures, camera, 3))
        jax.block_until_ready(jf(wt, scene.textures, camera, 1))
        r3 = float(np.asarray(jf(wt, scene.textures, camera, 3)[1]))
        r1 = float(np.asarray(jf(wt, scene.textures, camera, 1)[1]))
        rays[d] = (r3 - r1) / 2
        fns[d] = jf
        print(f"compiled d{d}", flush=True)

    for rnd in range(3):
        line = []
        for d, f in fns.items():
            t0 = time.perf_counter()
            np.asarray(f(wt, scene.textures, camera, 1)[0])
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(f(wt, scene.textures, camera, 3)[0])
            t3 = time.perf_counter() - t0
            ms = (t3 - t1) / 2 * 1e3
            line.append(f"d{d}: {ms:7.1f} ms ({rays[d]/1e3:6.0f}k rays)")
        print(f"round {rnd}: " + "   ".join(line), flush=True)


if __name__ == "__main__":
    main()
