"""Interleaved A/B of spheres-frame variants on the real TPU.

The tunneled chip's throughput drifts ~2x over minutes, so sequential A/B
runs are meaningless (measured: the same compiled program at 517 and 902
ms/frame eleven minutes apart). This tool compiles each variant as its OWN
jit entry (each variant is a distinct TuneConfig, an explicit jit cache
key) and interleaves timing rounds A,B,A,B..., reporting per-round pairs
so weather shifts are visible.

Run: python tools/ab_spheres.py [key|m2]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import build, tunnel_rt  # noqa: E402
from webgpu_raytracer_tpu.ops.tune import TuneConfig  # noqa: E402


def make_chained(wt, tex, camera, tune, width=512, height=512,
                 spp=1, depth=8):
    """A fresh jit entry traced with this variant's TuneConfig."""
    from webgpu_raytracer_tpu.ops.dense_trace import trace_pixels_dense

    def fn(wt, tex, camera, n):
        def body(i, acc):
            s, rays = acc
            col, r = trace_pixels_dense(
                wt, tex, camera, i + 1, jnp.zeros(2, jnp.float32),
                width, height, spp, depth, with_stats=True, tune=tune)
            return s + col.mean(), rays + r

        return jax.lax.fori_loop(0, n, body,
                                 (jnp.zeros(()), jnp.zeros(())))

    jf = jax.jit(fn)
    # Trace + compile both shapes now.
    jax.block_until_ready(jf(wt, tex, camera, 4))
    jax.block_until_ready(jf(wt, tex, camera, 1))
    return jf


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "key"
    tunnel_rt()
    world, wt, scene, camera = build("spheres")

    if mode == "key":
        variants = {"sbox": TuneConfig(key_mode="sbox"),
                    "obox": TuneConfig(key_mode="obox")}
    elif mode == "dir":
        variants = {f"dir{v}": TuneConfig(dir_bits=v) for v in (1, 2, 3)}
    elif mode == "cell":
        variants = {f"cell{v}": TuneConfig(cell_bits=v)
                    for v in (2, 3, 4, 5)}
    elif mode == "sub":
        variants = {f"sub{v}": TuneConfig(subtile=v)
                    for v in (1024, 32, 8)}
    elif mode == "seed":
        variants = {f"seed{v}": TuneConfig(seed_k=v)
                    for v in (0, 16)}
    elif mode == "seedk":
        variants = {f"seed{v}": TuneConfig(seed_k=v)
                    for v in (8, 16, 32)}
    elif mode == "narrow":
        variants = {"scan": TuneConfig(),
                    "jobs128": TuneConfig(narrow="jobs", m_tile3=128),
                    "jobs256": TuneConfig(narrow="jobs", m_tile3=256)}
    elif mode == "opt":
        variants = {
            "base": TuneConfig(),
            "seed8": TuneConfig(seed_k=8),
            "cull8": TuneConfig(cull_sub=8),
            "s8c8": TuneConfig(seed_k=8, cull_sub=8),
        }
    elif mode == "jobs":
        variants = {
            "g128_pb4": TuneConfig(narrow="jobs", m_tile3=128),
            "g128_pb8": TuneConfig(narrow="jobs", m_tile3=128,
                                   proc_batch=8, prefetch_depth=16),
            "g256_pb4": TuneConfig(narrow="jobs", m_tile3=256),
        }
    else:
        variants = {"m1024": TuneConfig(m_tile2=1024),
                    "m512": TuneConfig(m_tile2=512)}

    fns = {}
    for name, tune in variants.items():
        fns[name] = make_chained(wt, scene.textures, camera, tune)
        print(f"compiled {name}", flush=True)

    rays = {}
    for name, f in fns.items():
        rays[name] = float(np.asarray(f(wt, scene.textures, camera, 4)[1])) \
            - float(np.asarray(f(wt, scene.textures, camera, 1)[1]))

    for rnd in range(4):
        line = []
        for name, f in fns.items():
            t0 = time.perf_counter()
            np.asarray(f(wt, scene.textures, camera, 1)[0])
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(f(wt, scene.textures, camera, 4)[0])
            t4 = time.perf_counter() - t0
            dt = max(t4 - t1, 1e-6)
            line.append(f"{name}: {rays[name] / dt / 1e6:5.2f} Mrays/s "
                        f"({dt / 3 * 1e3:6.1f} ms/f)")
        print(f"round {rnd}: " + "   ".join(line), flush=True)


if __name__ == "__main__":
    main()
