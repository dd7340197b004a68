"""CPU-runnable tightness check for the subtile cone cull.

Compares tile_cluster_worklist survivor counts at sub=1024 (old tile-grain)
vs sub=32 (subtile grain) vs the EXACT per-lane sphere-interval test, on the
`spheres` preset with primary rays and synthetic coherence-sorted bounce rays.

Run: JAX_PLATFORMS=cpu python tools/cull_tightness.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import build  # noqa: E402
import webgpu_raytracer_tpu.ops.pallas_dense as pd  # noqa: E402
from webgpu_raytracer_tpu.ops.cluster_cull import tile_cluster_worklist  # noqa: E402

from webgpu_raytracer_tpu.ops.tune import DEFAULT_TUNE
M = DEFAULT_TUNE.m_tile2


def exact_counts(rayfT, t_max, sph, m_tile):
    """Exact per-lane sphere test, unioned per tile (the kernel's cull())."""
    d = np.asarray(rayfT[0:3])            # (3, R)
    o = np.asarray(rayfT[6:9])
    tm = np.asarray(t_max)
    sph = np.asarray(sph)
    live = sph[:, 3] >= 0
    c = sph[live, 0:3]                    # (C, 3)
    r = sph[live, 3]
    T = d.shape[1] // m_tile
    counts = np.zeros(T, np.int64)
    for t in range(T):
        sl = slice(t * m_tile, (t + 1) * m_tile)
        dt, ot, tmt = d[:, sl], o[:, sl], tm[sl]
        oc = ot[None] - c[:, :, None]     # (C, 3, m)
        b = (dt[None] * oc).sum(1)        # (C, m)
        dd = (dt * dt).sum(0)[None]
        cc = (oc * oc).sum(1) - (r ** 2)[:, None]
        disc = b * b - dd * cc
        sq = np.sqrt(np.maximum(disc, 0.0))
        ok = (disc >= 0) & (tmt[None] > 0) \
            & (-b + sq >= dd * 1e-3) & (-b - sq <= dd * tmt[None])
        counts[t] = ok.any(axis=1).sum()
    return counts


def report(name, rayfT, t_max, sph):
    ex = exact_counts(rayfT, t_max, sph, M)
    line = f"{name}: exact {ex.mean():7.1f}"
    for sub in (1024, 128, 32, 8):
        _, _, cnt = jax.jit(tile_cluster_worklist,
                            static_argnums=(3, 4))(rayfT, t_max, sph, M, sub)
        cnt = np.asarray(cnt)
        line += f" | sub={sub} {cnt.mean():7.1f}"
    print(line, flush=True)


def super_spheres(sph, g=16):
    """Bounding spheres of groups of g consecutive clusters: (S, 128)."""
    sph = np.asarray(sph)
    ct = sph.shape[0]
    pad = (-ct) % g
    if pad:
        sph = np.concatenate([sph, np.full((pad, sph.shape[1]), -1.0,
                                           sph.dtype)])
    grp = sph.reshape(-1, g, sph.shape[1])
    live = grp[:, :, 3] >= 0
    n = np.maximum(live.sum(1), 1)
    c = np.where(live[:, :, None], grp[:, :, 0:3], 0.0).sum(1) / n[:, None]
    d = np.linalg.norm(grp[:, :, 0:3] - c[:, None, :], axis=2) + grp[:, :, 3]
    r = np.where(live.any(1), np.where(live, d, 0.0).max(1), -1.0)
    out = np.zeros((grp.shape[0], 128), np.float32)
    out[:, 0:3] = c
    out[:, 3] = r
    return jnp.asarray(out)


def report_hier(name, rayfT, t_max, sph, m=M):
    """Hierarchical: sub=8 cones vs 16-cluster superspheres AND sub=32 vs
    cluster spheres. Pair map ~9x smaller than direct sub=8 vs clusters."""
    wl = jax.jit(tile_cluster_worklist, static_argnums=(3, 4))
    cm_cache = {}
    for g, s_sub, c_sub in ((16, 8, 32), (8, 8, 32), (16, 32, 32)):
        ssph = super_spheres(sph, g)
        s_surv = wl(rayfT, t_max, ssph, m, s_sub)
        # recover the per-tile survivor MASK from (order, keys, counts)
        order, keys, cnt = s_surv
        smask = np.asarray(keys) < 3e38            # (T, Sp) sorted positions
        T = smask.shape[0]
        sm = np.zeros((T, ssph.shape[0]), bool)
        o = np.asarray(order)
        for t in range(T):
            sm[t, o[t][smask[t]]] = True
        ct = np.asarray(sph).shape[0]
        expand = np.repeat(sm, g, axis=1)[:, :ct]  # (T, Ct)
        if cm_cache.get(c_sub) is None:
            corder, ckeys, _ = wl(rayfT, t_max, sph, m, c_sub)
            cmask_sorted = np.asarray(ckeys) < 3e38
            cm = np.zeros((T, ct), bool)
            co = np.asarray(corder)
            for t in range(T):
                cm[t, co[t][cmask_sorted[t]]] = True
            cm_cache[c_sub] = cm
        cm = cm_cache[c_sub]
        both = (cm & expand).sum(1)
        print(f"{name} hier g={g} ssub={s_sub} csub={c_sub}: "
              f"{both.mean():7.1f} survivors/tile", flush=True)


def report_mtile(name, rayfT, t_max, sph):
    """Kernel-tile-size sweep: FLOPs scale as sum(count)*m, DMA rows as
    sum(count). Prints both per 1M lanes so m_tile values are comparable."""
    rp = rayfT.shape[1]
    for m in (1024, 512, 256, 128):
        ex = exact_counts(rayfT, t_max, sph, m)
        _, _, cnt = jax.jit(tile_cluster_worklist,
                            static_argnums=(3, 4))(rayfT, t_max, sph, m, 32)
        cnt = np.asarray(cnt, np.int64)
        scale = (1 << 20) / rp
        print(f"{name} m={m:4d}: exact {ex.mean():7.1f} cone32 "
              f"{cnt.mean():7.1f} | per-1M-lanes: dma-rows "
              f"{cnt.sum() * scale / 1e3:8.1f}k  lane-cluster "
              f"{cnt.sum() * m * scale / 1e6:8.1f}M  (exact floor "
              f"{ex.sum() * m * scale / 1e6:8.1f}M)", flush=True)


def main():
    world, wt, scene, camera = build("spheres")
    side = 128
    R = side * side
    c = camera
    lane = jnp.arange(R, dtype=jnp.uint32)
    u = ((lane % side).astype(jnp.float32) + 0.5) / side
    v = 1.0 - ((lane // side).astype(jnp.float32) + 0.5) / side
    po = tuple(jnp.broadcast_to(c[i], (R,)) for i in range(3))
    pdir = (c[4] + u * c[8] + v * c[12] - c[0],
            c[5] + u * c[9] + v * c[13] - c[1],
            c[6] + u * c[10] + v * c[14] - c[2])
    sph = wt.spheres[:, 0, :]

    def sorted_rayft(o, d, tm):
        """Apply _run2's coherence sort (octant + origin cell) host-side."""
        rox, roy, roz = o
        rdx, rdy, rdz = d
        key = jnp.zeros_like(lane, dtype=jnp.int32)
        octant = jnp.zeros_like(key)
        lanelive = tm > 0
        for o_c, d_c in ((rox, rdx), (roy, rdy), (roz, rdz)):
            o_lo = jnp.min(jnp.where(lanelive, o_c, 3e38))
            o_ext = jnp.maximum(
                jnp.max(jnp.where(lanelive, o_c, -3e38)) - o_lo, 1e-20)
            q = jnp.clip(((o_c - o_lo) / o_ext * 8).astype(jnp.int32), 0, 7)
            key = key * 8 + q
            octant = octant * 2 + (d_c < 0).astype(jnp.int32)
        perm = jnp.argsort(jnp.where(lanelive, octant * 512 + key, 1 << 13))
        o = tuple(x[perm] for x in o)
        d = tuple(x[perm] for x in d)
        return pd.rayf_from_components(*o, *d), tm[perm]

    rayfT, tmax = sorted_rayft(po, pdir, jnp.full((R,), pd.T_MAX))
    report("primary", rayfT, tmax, sph)
    if "--hier" in sys.argv:
        report_hier("primary", rayfT, tmax, sph)
    if "--mtile" in sys.argv:
        report_mtile("primary", rayfT, tmax, sph)

    # Synthetic bounce: origins on random cluster sphere surfaces (live
    # geometry region), random directions — the incoherent population.
    rng = np.random.default_rng(7)
    live = np.asarray(sph[:, 3] >= 0)
    cs = np.asarray(sph)[live]
    pick = rng.integers(0, len(cs), R)
    dirs = rng.normal(size=(R, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    orig = cs[pick, 0:3] + dirs * cs[pick, 3:4] * 1.05
    d2 = rng.normal(size=(R, 3))
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    o = tuple(jnp.asarray(orig[:, i], jnp.float32) for i in range(3))
    d = tuple(jnp.asarray(d2[:, i], jnp.float32) for i in range(3))
    rayfT, tmax = sorted_rayft(o, d, jnp.full((R,), pd.T_MAX))
    report("bounce-synth", rayfT, tmax, sph)
    if "--hier" in sys.argv:
        report_hier("bounce-synth", rayfT, tmax, sph)
    if "--mtile" in sys.argv:
        report_mtile("bounce-synth", rayfT, tmax, sph)


if __name__ == "__main__":
    main()
