"""Scan coherence-sort key designs: survivor counts per ray tile on the
spheres preset for primary / bounce1-mirror / bounce1-diffuse ray
populations.

Total survivor work ~ sum(counts) x (M/128 x N/128 passes); lower is better.

Key finding this scan exists to test: the origin-cell half of the current
key quantizes against the CLUSTER bbox, and the spheres preset's r=1000
ground sphere blows that bbox to ~2000 units — so every bounce origin lands
in 1-2 cells and the key degenerates to direction-octant only. The "obox"
variants quantize against the live RAY-ORIGIN bbox instead.

Run: python tools/scan_sort_keys.py
"""
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import build  # noqa: E402
import webgpu_raytracer_tpu.ops.pallas_dense as pd  # noqa: E402
from webgpu_raytracer_tpu.ops.cluster_cull import tile_cluster_worklist  # noqa: E402
from webgpu_raytracer_tpu.ops.dense_trace import intersect_and_shade  # noqa: E402
from webgpu_raytracer_tpu.ops.v3 import V3, dot  # noqa: E402


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
    dv = V3(*pdir)
    n = hit.geom_n
    refl = dv - n * (2.0 * dot(dv, n))
    live = hit.wt >= 0
    b_o = (hp.x, hp.y, hp.z)
    b_d = (refl.x, refl.y, refl.z)
    b_tm = jnp.where(live, pd.T_MAX, 0.0)

    # Diffuse bounce: cosine-hemisphere-ish scatter (normal + unit jitter
    # from a cheap per-lane hash) — the realistic worst case for coherence.
    h = (lane * jnp.uint32(747796405) + jnp.uint32(2891336453))
    h ^= h >> 16

    def unif(k):
        x = (h * jnp.uint32(2654435761 + k * 40503)) >> 8
        return x.astype(jnp.float32) / jnp.float32(1 << 24) * 2.0 - 1.0

    jx, jy, jz = unif(1), unif(2), unif(3)
    jl = jnp.sqrt(jx * jx + jy * jy + jz * jz)
    d_o = (n.x + jx / jl * 0.999, n.y + jy / jl * 0.999,
           n.z + jz / jl * 0.999)

    sph = wt.spheres[:, 0, :]
    live_c = sph[:, 3] >= 0.0
    smin = jnp.min(jnp.where(live_c[:, None], sph[:, 0:3] - sph[:, 3:4],
                             3e38), axis=0)
    sext = jnp.maximum(jnp.max(
        jnp.where(live_c[:, None], sph[:, 0:3] + sph[:, 3:4], -3e38),
        axis=0) - smin, 1e-20)

    def cellq(o, bits, lo, ext):
        q = jnp.zeros((R,), jnp.int32)
        for a in range(3):
            qa = jnp.clip(((o[a] - lo[a]) / ext[a] * (1 << bits))
                          .astype(jnp.int32), 0, (1 << bits) - 1)
            q = q * (1 << bits) + qa
        return q

    def dirq(d, per_axis):
        dl = jnp.sqrt(d[0] ** 2 + d[1] ** 2 + d[2] ** 2)
        q = jnp.zeros((R,), jnp.int32)
        for a in range(3):
            dn = d[a] / jnp.maximum(dl, 1e-20)
            qa = jnp.clip(((dn + 1.0) * 0.5 * per_axis).astype(jnp.int32),
                          0, per_axis - 1)
            q = q * per_axis + qa
        return q

    def octq(d):
        q = jnp.zeros((R,), jnp.int32)
        for a in range(3):
            q = q * 2 + (d[a] < 0.0).astype(jnp.int32)
        return q

    def obox(o, tm):
        """Live-ray-origin bbox (the proposed robust cell frame)."""
        liv = tm > 0.0
        lo = jnp.stack([jnp.min(jnp.where(liv, o[a], 3e38)) for a in range(3)])
        hi = jnp.stack([jnp.max(jnp.where(liv, o[a], -3e38))
                        for a in range(3)])
        return lo, jnp.maximum(hi - lo, 1e-20)

    variants = {
        "A oct*512+cell3 sbox (cur)":
            lambda o, d, tm: octq(d) * 512 + cellq(o, 3, smin, sext),
        "B obox3*8+oct":
            lambda o, d, tm: cellq(o, 3, *obox(o, tm)) * 8 + octq(d),
        "C oct*512+obox3":
            lambda o, d, tm: octq(d) * 512 + cellq(o, 3, *obox(o, tm)),
        "D obox4*8+oct":
            lambda o, d, tm: cellq(o, 4, *obox(o, tm)) * 8 + octq(d),
        "E obox3*64+dir64":
            lambda o, d, tm: cellq(o, 3, *obox(o, tm)) * 64 + dirq(d, 4),
        "F dir64*512+obox3":
            lambda o, d, tm: dirq(d, 4) * 512 + cellq(o, 3, *obox(o, tm)),
        "G obox5*8+oct":
            lambda o, d, tm: cellq(o, 5, *obox(o, tm)) * 8 + octq(d),
        "H obox4*64+dir64":
            lambda o, d, tm: cellq(o, 4, *obox(o, tm)) * 64 + dirq(d, 4),
    }

    pops = (("primary", (po, pdir, jnp.full((R,), pd.T_MAX))),
            ("bounce1-mirror", (b_o, b_d, b_tm)),
            ("bounce1-diffuse", (b_o, d_o, b_tm)))
    for pop, (o, d, tm) in pops:
        print(f"--- {pop} ---", flush=True)
        for name, keyfn in variants.items():
            key = jnp.where(tm > 0.0, keyfn(o, d, tm), jnp.int32(1 << 24))
            perm = jnp.argsort(key)
            so = tuple(x[perm] for x in o)
            sd = tuple(x[perm] for x in d)
            stm = tm[perm]
            for m_tile in (1024, 512):
                rayfT = pd.rayf_from_components(*so, *sd)
                _, _, counts = tile_cluster_worklist(rayfT, stm, sph, m_tile)
                counts = np.asarray(counts)
                # total passes ~ sum(counts) * (5C/128) * (m/128)
                work = counts.sum() * 5 * (m_tile // 128)
                print(f"  {name:28s} M={m_tile}: mean={counts.mean():6.0f} "
                      f"sum={counts.sum():8d} relwork={work/1e6:7.2f}M",
                      flush=True)


if __name__ == "__main__":
    main()
