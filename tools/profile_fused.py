"""Profile the REAL fused sweep (2R lanes, shadow+closest) on spheres:
jnp prefix (key/sort/gather/worklist) vs pallas kernel vs epilogue.

Run: python tools/profile_fused.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import build  # noqa: E402
import webgpu_raytracer_tpu.ops.pallas_dense as pd
from webgpu_raytracer_tpu.ops.tune import DEFAULT_TUNE
M2 = DEFAULT_TUNE.m_tile2  # noqa: E402
from webgpu_raytracer_tpu.ops.dense_trace import intersect_and_shade  # noqa: E402
from webgpu_raytracer_tpu.ops.v3 import V3  # noqa: E402


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


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

    # Fused 2R population: shadow rays (toward a fake light point) then
    # diffuse extension rays — the per-bounce reality.
    lx, ly, lz = 0.0, 5.0, 0.0
    sdx, sdy, sdz = lx - hp.x, ly - hp.y, lz - hp.z
    sl = jnp.sqrt(sdx**2 + sdy**2 + sdz**2) + 1e-9
    cat = jnp.concatenate
    ro = (cat([hp.x, hp.x]), cat([hp.y, hp.y]), cat([hp.z, hp.z]))
    rd = (cat([sdx / sl, n.x + jx / jl * 0.999]),
          cat([sdy / sl, n.y + jy / jl * 0.999]),
          cat([sdz / sl, n.z + jz / jl * 0.999]))
    tmax = cat([jnp.where(live, sl, 0.0), jnp.where(live, pd.T_MAX, 0.0)])

    f_full = jax.jit(lambda ro, rd, tm: pd.pallas_closest_with_row(
        wt, ro, rd, t_max=tm, row_from_lane=R)[0])
    print(f"fused sweep FULL  : {timeit(f_full, ro, rd, tmax):8.2f} ms",
          flush=True)

    # jnp prefix only: replicate _run2 up to (and including) the worklist.
    from webgpu_raytracer_tpu.ops.cluster_cull import tile_cluster_worklist

    sph_flat = wt.spheres[:, 0, :]

    def prefix(rox, roy, roz, rdx, rdy, rdz, t_max):
        rp = R * 2
        lane_live = t_max > 0.0
        key = jnp.zeros((rp,), jnp.int32)
        octant = jnp.zeros((rp,), jnp.int32)
        for a, (o_c, d_c) in enumerate(((rox, rdx), (roy, rdy), (roz, rdz))):
            o_lo = jnp.min(jnp.where(lane_live, o_c, jnp.float32(3e38)))
            o_ext = jnp.maximum(
                jnp.max(jnp.where(lane_live, o_c, jnp.float32(-3e38)))
                - o_lo, 1e-20)
            q = jnp.clip(((o_c - o_lo) / o_ext * 8.0).astype(jnp.int32), 0, 7)
            key = key * 8 + q
            octant = octant * 2 + (d_c < 0.0).astype(jnp.int32)
        key = octant * 512 + key
        key = jnp.where(t_max > 0.0, key, jnp.int32(1 << 13))
        seg = (jnp.arange(rp, dtype=jnp.int32) >= R).astype(jnp.int32)
        perm = jnp.argsort(key + seg * (1 << 14))
        inv_perm = jnp.argsort(perm)
        comps = jnp.stack([rox, roy, roz, rdx, rdy, rdz, t_max,
                           jnp.zeros_like(t_max)], axis=1)
        sortedT = comps[perm, :].T
        rayfT = pd.rayf_from_components(sortedT[0], sortedT[1], sortedT[2],
                                        sortedT[3], sortedT[4], sortedT[5])
        from webgpu_raytracer_tpu.render.worldtris import FEAT_K3, FEAT_P
        rh, rl = pd._split2(rayfT[:FEAT_P])
        zpad = jnp.zeros((FEAT_K3 - 3 * FEAT_P, rayfT.shape[1]), rh.dtype)
        rayk3 = jnp.concatenate([rh, rl, rh, zpad], axis=0)
        order, keys, counts = tile_cluster_worklist(rayfT, sortedT[6],
                                                    sph_flat, M2)
        return rayk3.sum() + order.sum() + keys.sum() + counts.sum() \
            + inv_perm.sum()

    args = (*(x for x in ro), *(x for x in rd), tmax)
    f_pre = jax.jit(prefix)
    print(f"jnp prefix        : {timeit(f_pre, *args):8.2f} ms", flush=True)

    # worklist alone at 2R
    perm0 = jnp.argsort(jnp.where(tmax > 0.0, jnp.zeros(2 * R, jnp.int32),
                                  1))
    rayfT0 = pd.rayf_from_components(*(x for x in ro), *(x for x in rd))
    f_wl = jax.jit(lambda rf, t_: tile_cluster_worklist(rf, t_, sph_flat,
                                                        M2))
    o_, k_, counts = f_wl(rayfT0, tmax)
    print(f"worklist alone 2R : {timeit(f_wl, rayfT0, tmax):8.2f} ms",
          flush=True)

    # epilogue: (rp, 48) unpermute gather at 2R
    inv = jnp.argsort(perm0)
    rows48 = jnp.zeros((48, 2 * R), jnp.float32) + 1.5
    f_g48 = jax.jit(lambda r, p: r.T[p, :].T)
    print(f"epilogue 48-gather: {timeit(f_g48, rows48, inv):8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
