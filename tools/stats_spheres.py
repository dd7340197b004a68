"""Kernel-measured survivor-loop stats on spheres: iterations vs PROCESSED
clusters per ray tile, for primary and diffuse-bounce populations.

Run: python tools/stats_spheres.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import build  # noqa: E402
import webgpu_raytracer_tpu.ops.pallas_dense as pd  # noqa: E402
from webgpu_raytracer_tpu.ops.dense_trace import intersect_and_shade  # noqa: E402
from webgpu_raytracer_tpu.ops.v3 import V3  # noqa: E402


def main():
    world, wt, scene, camera = build("spheres")
    R = 512 * 512
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
    hit = intersect_and_shade(wt, jnp.ones((1, 1, 1, 3)), V3(*po), V3(*pdir),
                              jnp.ones(R, bool))
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

    f = jax.jit(lambda ro, rd, tm: pd._run2(
        wt, ro, rd, tm, jnp.ones(R, bool), 1e-3, False, False,
        with_stats=True))

    for name, (o, d, tm) in (
            ("primary", (po, pdir, jnp.full((R,), pd.T_MAX))),
            ("bounce1-diffuse", ((hp.x, hp.y, hp.z), d_o, b_tm))):
        _, _, st = f(o, d, tm)
        st = np.asarray(st)
        it, proc, cnt = st[:, 0], st[:, 1], st[:, 2]
        sel = cnt > 0
        print(f"{name}: live tiles {sel.sum()}/{len(cnt)}", flush=True)
        print(f"  worklist count: mean {cnt[sel].mean():7.1f} "
              f"max {cnt[sel].max():.0f}")
        print(f"  iterations    : mean {it[sel].mean():7.1f} "
              f"max {it[sel].max():.0f}  sum {it.sum():.0f}")
        print(f"  processed     : mean {proc[sel].mean():7.1f} "
              f"max {proc[sel].max():.0f}  sum {proc.sum():.0f}",
              flush=True)


if __name__ == "__main__":
    main()
