"""TPU A/B: where does the textured-1080p frame time go?

Three interleaved variants of the SAME textured-GLB 1080p d8 frame
(bench config 3), each compiled as its own jit entry:

  tex     — real packed-quad-table sampling (production path)
  notex   — sample_texture_v3 stubbed to white AT TRACE TIME: identical
            bounce loop, zero texture gathers (isolates gather cost; the
            radiance is wrong, which is fine for timing)
  white   — 1x1 white texture operand (the untextured fast path: also
            skips the has-texture plumbing)

plus a gather microbench on the real quad-table shape: (K*1024^2, 4) u32
rows at 2M indices — random, sorted, and 90%-dead (dead lanes clamp to
row 0, probing whether repeated rows gather cheaper).

Run: python tools/profile_textured.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import build, tunnel_rt  # noqa: E402
import webgpu_raytracer_tpu.ops.dense_trace as dt  # noqa: E402
from webgpu_raytracer_tpu.ops.v3 import V3  # noqa: E402


def make_chained(wt, tex, camera, stub_sampler, width=1920, height=1080,
                 spp=1, depth=8):
    from webgpu_raytracer_tpu.ops.dense_trace import trace_pixels_dense

    def fn(wt, tex, camera, n):
        def body(i, acc):
            s, rays = acc
            col, r = trace_pixels_dense(
                wt, tex, camera, i + 1, jnp.zeros(2, jnp.float32),
                width, height, spp, depth, with_stats=True)
            return s + col.mean(), rays + r

        return jax.lax.fori_loop(0, n, body,
                                 (jnp.zeros(()), jnp.zeros(())))

    jf = jax.jit(fn)
    real = dt.sample_texture_v3
    if stub_sampler:
        def white(textures, tex_idx, u, v):
            one = jnp.ones_like(u)
            return V3(one, one, one)
        dt.sample_texture_v3 = white
    try:
        jax.block_until_ready(jf(wt, tex, camera, 4))
        jax.block_until_ready(jf(wt, tex, camera, 1))
    finally:
        dt.sample_texture_v3 = real
    return jf


def main():
    tunnel_rt()
    from tests.glb_fixture import textured_quad_glb

    _, wt, scene, camera = build("viewer", glb_data=textured_quad_glb(),
                                 width=1920, height=1080)
    white_tex = jnp.ones((1, 1, 1, 3), jnp.float32)

    from webgpu_raytracer_tpu.ops.dense_trace import tex_level

    l0 = tex_level(scene.textures, 0)
    l1 = tex_level(scene.textures, 1)
    fns = {
        "tex": (make_chained(wt, scene.textures, camera, False),
                scene.textures),
        "l0only": (make_chained(wt, (l0, white_tex), camera, False),
                   (l0, white_tex)),       # level-1 (kron mip) stubbed
        "l1only": (make_chained(wt, (white_tex, l1), camera, False),
                   (white_tex, l1)),       # level-0 gather stubbed
        "notex": (make_chained(wt, scene.textures, camera, True),
                  scene.textures),
        "white": (make_chained(wt, white_tex, camera, False), white_tex),
    }
    print("compiled all variants", flush=True)

    rays = {}
    for name, (f, tex) in fns.items():
        rays[name] = float(np.asarray(f(wt, tex, camera, 4)[1])) \
            - float(np.asarray(f(wt, tex, camera, 1)[1]))

    for rnd in range(4):
        line = []
        for name, (f, tex) in fns.items():
            t0 = time.perf_counter()
            np.asarray(f(wt, tex, camera, 1)[0])
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(f(wt, tex, camera, 4)[0])
            t4 = time.perf_counter() - t0
            dtime = max(t4 - t1, 1e-6)
            line.append(f"{name}: {rays[name] / dtime / 1e6:6.2f} Mrays/s "
                        f"({dtime / 3 * 1e3:6.1f} ms/f)")
        print(f"round {rnd}: " + "   ".join(line), flush=True)

    # --- quad-table gather microbench at the production shape ---
    key = jax.random.PRNGKey(0)
    n_rows = l0.shape[0] * l0.shape[1] * l0.shape[2]
    table = l0.reshape(-1, 4)
    r = 1 << 21
    f = jax.jit(lambda t, i: t[i].sum())
    idx_r = jax.random.randint(key, (r,), 0, n_rows)
    cases = {
        "random": idx_r,
        "sorted": jnp.sort(idx_r),
        "90pct-dead(row0)": jnp.where(
            jax.random.uniform(key, (r,)) < 0.9, 0, idx_r),
    }
    for name, idx in cases.items():
        jax.block_until_ready(f(table, idx))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(table, idx))
            best = min(best, time.perf_counter() - t0)
        print(f"gather ({n_rows>>20}M,4)u32 2M idx {name}: "
              f"{best*1e3:7.2f} ms  {best/r*1e9:5.1f} ns/row", flush=True)


if __name__ == "__main__":
    main()
