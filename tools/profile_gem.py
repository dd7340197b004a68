"""Attribute the gem 256^2 d5 gap: launch overhead vs device compute.

Measures (a) chained-frame ms/frame across resolutions at fixed depth —
the resolution-independent floor is per-frame fixed cost (dispatch,
fusion launches, bounce-loop conds), not ray work; (b) the per-bounce
program count's contribution by comparing depth 2 vs 5 at fixed size;
(c) the WRT_SHADE_KERNEL=1 rows path (one Pallas shade kernel per bounce
instead of ~30 XLA fusions) in this launch-bound regime.

Run: python tools/profile_gem.py [rows]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import GEM_OBJ, build, tunnel_rt  # noqa: E402


def make_fn(wt, tex, camera, width, height, depth, spp=1):
    from webgpu_raytracer_tpu.ops.dense_trace import trace_pixels_dense

    def fn(wt, tex, camera, n):
        def body(i, acc):
            s, rays = acc
            col, r = trace_pixels_dense(
                wt, tex, camera, i + 1, jnp.zeros(2, jnp.float32),
                width, height, spp, depth, with_stats=True)
            return s + col.mean(), rays + r

        return jax.lax.fori_loop(0, n, body, (jnp.zeros(()), jnp.zeros(())))

    jf = jax.jit(fn)
    jax.block_until_ready(jf(wt, tex, camera, 8))
    jax.block_until_ready(jf(wt, tex, camera, 2))
    return jf


def measure(jf, wt, tex, camera, n=8):
    rays = float(np.asarray(jf(wt, tex, camera, n)[1])) \
        - float(np.asarray(jf(wt, tex, camera, 2)[1]))
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jf(wt, tex, camera, 2)[0])
        t2 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(jf(wt, tex, camera, n)[0])
        tn = time.perf_counter() - t0
        best = min(best, max(tn - t2, 1e-6))
    return best / (n - 2) * 1e3, rays / (n - 2)


def main():
    tunnel_rt()
    _, wt, scene, camera = build("viewer", obj_source=GEM_OBJ,
                                 width=256, height=256)
    print("clusters:", wt.featk3.shape[0], flush=True)

    for wh in (128, 256, 512):
        jf = make_fn(wt, scene.textures, camera, wh, wh, 5)
        ms, rays = measure(jf, wt, scene.textures, camera)
        print(f"{wh}x{wh} d5: {ms:7.3f} ms/frame  "
              f"{rays/ms/1e3:6.1f} Mrays/s", flush=True)

    for d in (2, 5, 8):
        jf = make_fn(wt, scene.textures, camera, 256, 256, d)
        ms, rays = measure(jf, wt, scene.textures, camera)
        print(f"256x256 d{d}: {ms:7.3f} ms/frame  "
              f"{rays/ms/1e3:6.1f} Mrays/s", flush=True)

    for spp in (2, 4):
        jf = make_fn(wt, scene.textures, camera, 256, 256, 5, spp=spp)
        ms, rays = measure(jf, wt, scene.textures, camera)
        print(f"256x256 d5 spp{spp}: {ms:7.3f} ms/frame  "
              f"{rays/ms/1e3:6.1f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
