"""Breakdown of one spheres-preset fused sweep: where do the ms go?

Times, on the real TPU, the separable pieces of the two-level path for a
realistic bounce-1 ray population (the dominant workload of the 257k-tri
spheres frame):

  argsort        the coherence-sort key + argsort
  comps-gather   the (rp, 8) row gather applying the permutation
  worklist       tile_cluster_worklist (broad phase, jnp)
  sweep-norow    pallas sweep t/idx only
  sweep-row      pallas sweep with in-kernel shade-row fetch
  unperm-vec     two (rp,) gathers (t, idx un-permute)
  unperm-rows    the (rp, 48) transposed row gather un-permute

Run: python tools/profile_spheres.py
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
from webgpu_raytracer_tpu.ops.v3 import V3, dot  # noqa: E402


def timeit(fn, *args, n=10):
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
    # diffuse-ish scatter for realism
    h = (lane * jnp.uint32(747796405) + jnp.uint32(2891336453))
    h ^= h >> 16

    def unif(k):
        x = (h * jnp.uint32(2654435761 + k * 40503)) >> 8
        return x.astype(jnp.float32) / jnp.float32(1 << 24) * 2.0 - 1.0

    jx, jy, jz = unif(1), unif(2), unif(3)
    jl = jnp.sqrt(jx * jx + jy * jy + jz * jz) + 1e-9
    d_o = (n.x + jx / jl * 0.999, n.y + jy / jl * 0.999,
           n.z + jz / jl * 0.999)
    live = hit.wt >= 0
    tm = jnp.where(live, pd.T_MAX, 0.0)
    nlive = int(np.asarray(live.sum()))
    print(f"live bounce lanes: {nlive}/{R}", flush=True)

    ro = tuple(jnp.asarray(x) for x in (hp.x, hp.y, hp.z))
    rd = tuple(jnp.asarray(x) for x in d_o)

    # Full sweeps (closest, row and no-row)
    f_row = jax.jit(lambda ro, rd, tm: pd.pallas_closest_with_row(
        wt, ro, rd, t_max=tm)[2])
    f_norow = jax.jit(lambda ro, rd, tm: pd.pallas_closest(
        wt, ro, rd, t_max=tm))
    print(f"sweep WITH row : {timeit(f_row, ro, rd, tm):8.2f} ms", flush=True)
    print(f"sweep NO row   : {timeit(f_norow, ro, rd, tm):8.2f} ms",
          flush=True)

    # Pieces
    sph_flat = wt.spheres[:, 0, :]

    def sort_key(ro, rd, tm):
        live_c = sph_flat[:, 3] >= 0.0
        smin = jnp.min(jnp.where(live_c[:, None], sph_flat[:, 0:3]
                                 - sph_flat[:, 3:4], 3e38), axis=0)
        sext = jnp.maximum(jnp.max(
            jnp.where(live_c[:, None], sph_flat[:, 0:3] + sph_flat[:, 3:4],
                      -3e38), axis=0) - smin, 1e-20)
        key = jnp.zeros((R,), jnp.int32)
        octant = jnp.zeros((R,), jnp.int32)
        for a in range(3):
            q = jnp.clip(((ro[a] - smin[a]) / sext[a] * 8.0)
                         .astype(jnp.int32), 0, 7)
            key = key * 8 + q
            octant = octant * 2 + (rd[a] < 0.0).astype(jnp.int32)
        key = octant * 512 + key
        return jnp.where(tm > 0.0, key, jnp.int32(1 << 13))

    f_key = jax.jit(lambda ro, rd, tm: jnp.argsort(sort_key(ro, rd, tm)))
    perm = f_key(ro, rd, tm)
    print(f"key+argsort    : {timeit(f_key, ro, rd, tm):8.2f} ms", flush=True)

    comps = jnp.stack(list(ro) + list(rd)
                      + [tm, jnp.zeros_like(tm)], axis=1)
    f_g8 = jax.jit(lambda c, p: c[p, :].T)
    print(f"comps (rp,8) gather: {timeit(f_g8, comps, perm):8.2f} ms",
          flush=True)

    inv = jnp.argsort(perm)
    rows48 = jnp.zeros((48, R), jnp.float32) + 1.5
    f_g48 = jax.jit(lambda r, p: r.T[p, :].T)
    print(f"rows (rp,48) gather: {timeit(f_g48, rows48, inv):8.2f} ms",
          flush=True)
    vec = jnp.zeros((R,), jnp.float32) + 2.0
    f_g1 = jax.jit(lambda v_, p: v_[p])
    print(f"one (rp,) gather   : {timeit(f_g1, vec, inv):8.2f} ms",
          flush=True)

    # Broad phase
    from webgpu_raytracer_tpu.ops.cluster_cull import tile_cluster_worklist

    rayfT = pd.rayf_from_components(*[x[perm] for x in ro],
                                    *[x[perm] for x in rd])
    stm = tm[perm]
    f_wl = jax.jit(lambda rf, t_: tile_cluster_worklist(rf, t_, sph_flat,
                                                        M2))
    o_, k_, counts = f_wl(rayfT, stm)
    print(f"worklist       : {timeit(f_wl, rayfT, stm):8.2f} ms", flush=True)
    counts = np.asarray(counts)
    print(f"survivors/tile : mean={counts.mean():.0f} max={counts.max()} "
          f"sum={counts.sum()}", flush=True)


if __name__ == "__main__":
    main()
