"""Kernel-ablation attribution of the spheres survivor loop (real TPU).

Times _run2 (no row fetch) on a realistic bounce-1 population under three
trace-time ablations (`TuneConfig.debug2`):

  normal  — production kernel
  noproc  — loop runs every cull but never DMAs/processes a cluster
            (isolates pure loop + cull cost)
  nocull  — every reachable survivor is DMA'd + processed
            (isolates matmul/DMA throughput; cull still evaluated)

Run: python tools/debug_spheres.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import build, tunnel_rt  # noqa: E402
import webgpu_raytracer_tpu.ops.pallas_dense as pd  # noqa: E402
from webgpu_raytracer_tpu.ops.dense_trace import intersect_and_shade  # noqa: E402
from webgpu_raytracer_tpu.ops.v3 import V3  # noqa: E402


def bounce_population(wt, camera, R=512 * 512):
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
    hit = intersect_and_shade(wt, jnp.ones((1, 1, 1, 3)), V3(*po),
                              V3(*pdir), jnp.ones(R, bool))
    hp = V3(*po) + V3(*pdir) * hit.hit_t
    n = hit.geom_n
    h = (lane * jnp.uint32(747796405) + jnp.uint32(2891336453))
    h ^= h >> 16

    def unif(k):
        x = (h * jnp.uint32(2654435761 + k * 40503)) >> 8
        return x.astype(jnp.float32) / jnp.float32(1 << 24) * 2.0 - 1.0

    jx, jy, jz = unif(1), unif(2), unif(3)
    jl = jnp.sqrt(jx * jx + jy * jy + jz * jz) + 1e-9
    live = hit.wt >= 0
    d_o = (n.x + jx / jl * 0.999, n.y + jy / jl * 0.999,
           n.z + jz / jl * 0.999)
    b_tm = jnp.where(live, pd.T_MAX, 0.0)
    return (hp.x, hp.y, hp.z), d_o, b_tm


def main():
    tunnel_rt()
    world, wt, scene, camera = build("spheres")
    R = 512 * 512
    o, d, tm = bounce_population(wt, camera)
    act = jnp.ones(R, bool)

    from webgpu_raytracer_tpu.ops.tune import TuneConfig

    fns = {}
    for name in ("normal", "noproc", "nocull"):
        tune = TuneConfig(debug2="" if name == "normal" else name)
        f = jax.jit(lambda o, d, tm, tune=tune: pd._run2(
            wt, o, d, tm, act, 1e-3, False, False, tune=tune))
        np.asarray(f(o, d, tm)[0])  # np.asarray: block_until_ready is
        fns[name] = f               # unreliable over the axon tunnel
        print(f"compiled {name}", flush=True)

    for rnd in range(4):
        line = []
        for name, f in fns.items():
            t0 = time.perf_counter()
            for _ in range(5):
                out = f(o, d, tm)
            np.asarray(out[0])  # device executes in order: one readback
            line.append(f"{name}: {(time.perf_counter() - t0) / 5 * 1e3:7.2f} ms")
        print(f"round {rnd}: " + "   ".join(line), flush=True)


if __name__ == "__main__":
    main()
