"""Pair-enumeration sizing study for the spheres survivor loop (real TPU).

The round-4 plan replaces tile-granular cluster processing with explicit
(ray, cluster) pair enumeration. Its cost scales with the TRUE pair count,
so this tool measures, on real primary and bounce-1 populations of the
`spheres` preset (512^2):

  static   per-lane survivor count with t_max clamped only by the scene
           AABB slab exit (what a one-shot pair enumeration must process)
  oracle   per-lane count with t_max = the actual closest-hit t (the floor
           any tightening scheme could reach)
  entry<=hit  per-lane count of clusters whose MIN-REACH (entry) distance
           is <= the actual hit distance: what near-to-far processing with
           a running best-t achieves (clusters are culled by entry-vs-best,
           not containment) — the realistic wave-processing pair count
  group8/128  unions over 8-lane and 128-lane groups of coherence-sorted
           lanes (pair granularities that gather cheaper)

Run: python tools/pair_stats.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import build, tunnel_rt  # noqa: E402
import webgpu_raytracer_tpu.ops.pallas_dense as pd  # noqa: E402
from debug_spheres import bounce_population  # noqa: E402
from webgpu_raytracer_tpu.ops.tune import DEFAULT_TUNE  # noqa: E402


def coherence_perm(o, d, t_max, rp):
    """Replicate _run2's coherence-sort key (obox cells + octant)."""
    rox, roy, roz = o
    rdx, rdy, rdz = d
    lane_live = t_max > 0.0
    key = jnp.zeros((rp,), jnp.int32)
    octant = jnp.zeros((rp,), jnp.int32)
    cb = DEFAULT_TUNE.cell_bits
    for o_c, d_c in ((rox, rdx), (roy, rdy), (roz, rdz)):
        o_lo = jnp.min(jnp.where(lane_live, o_c, jnp.float32(3e38)))
        o_ext = jnp.maximum(
            jnp.max(jnp.where(lane_live, o_c, jnp.float32(-3e38))) - o_lo,
            1e-20)
        cl = 1 << cb
        q = jnp.clip(((o_c - o_lo) / o_ext * cl).astype(jnp.int32), 0, cl - 1)
        key = key * cl + q
        octant = octant * 2 + (d_c < 0.0).astype(jnp.int32)
    cell_span = 1 << (3 * cb)
    key = octant * cell_span + key
    key = jnp.where(lane_live, key, jnp.int32(cell_span * 8))
    return jnp.argsort(key)


def survivor_counts(o, d, t_clip, sph_flat, chunk=128):
    """Per-lane count of clusters whose sphere intersects [t_min, t_clip].

    t_clip is in RAY-PARAMETER units (same as the kernel's open interval).
    Returns (R,) i32 counts and a callable mask_fn(c0) used for group stats.
    """
    rox, roy, roz = o
    rdx, rdy, rdz = d
    R = rox.shape[0]
    Ct = sph_flat.shape[0]
    t_min = 1e-3

    def body(c0, acc):
        sph = jax.lax.dynamic_slice(sph_flat, (c0 * chunk, 0), (chunk, 128))
        cx, cy, cz, r = sph[:, 0], sph[:, 1], sph[:, 2], sph[:, 3]
        # (chunk, R) pair test
        ocx = rox[None, :] - cx[:, None]
        ocy = roy[None, :] - cy[:, None]
        ocz = roz[None, :] - cz[:, None]
        b = rdx[None] * ocx + rdy[None] * ocy + rdz[None] * ocz
        dd = (rdx * rdx + rdy * rdy + rdz * rdz)[None]
        cc = ocx * ocx + ocy * ocy + ocz * ocz - (r * r)[:, None]
        disc = b * b - dd * cc
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        ok = (disc >= 0.0) & (t_clip[None] > 0.0) & (r[:, None] >= 0.0) \
            & (-b + sq >= dd * t_min) & (-b - sq <= dd * t_clip[None])
        return acc + ok.sum(axis=0, dtype=jnp.int32)

    nchunks = -(-Ct // chunk)
    pad = nchunks * chunk - Ct
    sph_flat = jnp.pad(sph_flat, ((0, pad), (0, 0)),
                       constant_values=-1.0)
    return jax.lax.fori_loop(0, nchunks, body, jnp.zeros((R,), jnp.int32))


def group_union_counts(o, d, t_clip, sph_flat, g, chunk=128):
    """Per-g-lane-group union survivor counts (lanes already sorted)."""
    rox, roy, roz = o
    R = rox.shape[0]
    Ct = sph_flat.shape[0]
    t_min = 1e-3
    rdx, rdy, rdz = d
    G = R // g

    def body(c0, acc):
        sph = jax.lax.dynamic_slice(sph_flat, (c0 * chunk, 0), (chunk, 128))
        cx, cy, cz, r = sph[:, 0], sph[:, 1], sph[:, 2], sph[:, 3]
        ocx = rox[None, :] - cx[:, None]
        ocy = roy[None, :] - cy[:, None]
        ocz = roz[None, :] - cz[:, None]
        b = rdx[None] * ocx + rdy[None] * ocy + rdz[None] * ocz
        dd = (rdx * rdx + rdy * rdy + rdz * rdz)[None]
        cc = ocx * ocx + ocy * ocy + ocz * ocz - (r * r)[:, None]
        disc = b * b - dd * cc
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        ok = (disc >= 0.0) & (t_clip[None] > 0.0) & (r[:, None] >= 0.0) \
            & (-b + sq >= dd * t_min) & (-b - sq <= dd * t_clip[None])
        u = ok.reshape(chunk, G, g).any(axis=2)   # (chunk, G)
        return acc + u.sum(axis=0, dtype=jnp.int32)

    nchunks = -(-Ct // chunk)
    pad = nchunks * chunk - Ct
    sph_flat = jnp.pad(sph_flat, ((0, pad), (0, 0)), constant_values=-1.0)
    return jax.lax.fori_loop(0, nchunks, body, jnp.zeros((G,), jnp.int32))


def entry_le_hit_counts(o, d, hit_t, sph_flat, chunk=128):
    """Clusters whose ENTRY t is <= the lane's final hit t (+eps): the pair
    count of an idealized near-to-far wave processor."""
    rox, roy, roz = o
    rdx, rdy, rdz = d
    R = rox.shape[0]
    Ct = sph_flat.shape[0]
    t_min = 1e-3

    def body(c0, acc):
        sph = jax.lax.dynamic_slice(sph_flat, (c0 * chunk, 0), (chunk, 128))
        cx, cy, cz, r = sph[:, 0], sph[:, 1], sph[:, 2], sph[:, 3]
        ocx = rox[None, :] - cx[:, None]
        ocy = roy[None, :] - cy[:, None]
        ocz = roz[None, :] - cz[:, None]
        b = rdx[None] * ocx + rdy[None] * ocy + rdz[None] * ocz
        dd = (rdx * rdx + rdy * rdy + rdz * rdz)[None]
        cc = ocx * ocx + ocy * ocy + ocz * ocz - (r * r)[:, None]
        disc = b * b - dd * cc
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_entry = (-b - sq) / dd   # may be negative (origin inside)
        ok = (disc >= 0.0) & (hit_t[None] > 0.0) & (r[:, None] >= 0.0) \
            & (-b + sq >= dd * t_min) \
            & (t_entry <= hit_t[None] * 1.0001)
        return acc + ok.sum(axis=0, dtype=jnp.int32)

    nchunks = -(-Ct // chunk)
    pad = nchunks * chunk - Ct
    sph_flat = jnp.pad(sph_flat, ((0, pad), (0, 0)), constant_values=-1.0)
    return jax.lax.fori_loop(0, nchunks, body, jnp.zeros((R,), jnp.int32))


def scene_exit_clip(o, d, t_max, sph_flat):
    """t_max clamped by the scene-AABB slab exit (the kernel's wcap)."""
    rox, roy, roz = o
    rdx, rdy, rdz = d
    live = sph_flat[:, 3] >= 0.0
    smin = jnp.min(jnp.where(live[:, None], sph_flat[:, 0:3]
                             - sph_flat[:, 3:4], jnp.float32(3e38)), axis=0)
    s_hi = jnp.max(jnp.where(live[:, None], sph_flat[:, 0:3]
                             + sph_flat[:, 3:4], jnp.float32(-3e38)), axis=0)
    t_exit = None
    for ax, (o_c, d_c) in enumerate(((rox, rdx), (roy, rdy), (roz, rdz))):
        d_safe = jnp.where(jnp.abs(d_c) > 1e-20, d_c,
                           jnp.where(d_c >= 0.0, 1e-20, -1e-20))
        t1 = (smin[ax] - o_c) / d_safe
        t2 = (s_hi[ax] - o_c) / d_safe
        hi_ = jnp.maximum(t1, t2)
        t_exit = hi_ if t_exit is None else jnp.minimum(t_exit, hi_)
    return jnp.minimum(t_max, jnp.maximum(t_exit, 0.0))


def main():
    tunnel_rt()
    world, wt, scene, camera = build("spheres")
    R = 512 * 512
    sph_flat = wt.spheres[:, 0, :]
    Ct = int(sph_flat.shape[0])
    print(f"clusters: {Ct}", flush=True)

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
    p_tm = jnp.full((R,), pd.T_MAX)

    bo, bd, b_tm = bounce_population(wt, camera)

    closest = jax.jit(lambda o, d, tm: pd._run2(
        wt, o, d, tm, jnp.ones(R, bool), 1e-3, False, False))

    for name, (o, d, tm) in (("primary", (po, pdir, p_tm)),
                             ("bounce1", ((bo[0], bo[1], bo[2]), bd, b_tm))):
        hit_t, hit_i = closest(o, d, tm)
        hit_t = jnp.where(hit_i >= 0, hit_t, 0.0)  # misses: no pairs needed
        live = np.asarray(tm) > 0.0

        t_static = scene_exit_clip(o, d, tm, sph_flat)
        cs = np.asarray(jax.jit(survivor_counts)(o, d, t_static, sph_flat))
        co = np.asarray(jax.jit(survivor_counts)(
            o, d, jnp.where(hit_i >= 0, hit_t * 1.0001, 0.0), sph_flat))
        ce = np.asarray(jax.jit(entry_le_hit_counts)(
            o, d, jnp.where(hit_i >= 0, hit_t, t_static), sph_flat))

        perm = coherence_perm(o, d, tm, R)
        os_ = tuple(x[perm] for x in o)
        ds_ = tuple(x[perm] for x in d)
        ts_ = t_static[perm]
        g8 = np.asarray(jax.jit(group_union_counts, static_argnums=4)(
            os_, ds_, ts_, sph_flat, 8))
        g128 = np.asarray(jax.jit(group_union_counts, static_argnums=4)(
            os_, ds_, ts_, sph_flat, 128))

        nl = max(live.sum(), 1)
        print(f"[{name}] live {live.sum()}/{R}")
        print(f"  static  per-lane: mean {cs[live].mean():8.2f}  p50 "
              f"{np.percentile(cs[live], 50):6.0f}  p95 "
              f"{np.percentile(cs[live], 95):6.0f}  max {cs[live].max():6d}"
              f"  total pairs {cs[live].sum()/1e6:8.2f} M")
        print(f"  oracle  per-lane: mean {co[live].mean():8.2f}  p50 "
              f"{np.percentile(co[live], 50):6.0f}  p95 "
              f"{np.percentile(co[live], 95):6.0f}  max {co[live].max():6d}"
              f"  total pairs {co[live].sum()/1e6:8.2f} M")
        print(f"  entry<=hit      : mean {ce[live].mean():8.2f}  p50 "
              f"{np.percentile(ce[live], 50):6.0f}  p95 "
              f"{np.percentile(ce[live], 95):6.0f}  max {ce[live].max():6d}"
              f"  total pairs {ce[live].sum()/1e6:8.2f} M")
        print(f"  static group-8 union:   mean {g8.mean():8.2f} "
              f" total (x8 lanes) {g8.sum()*8/1e6:8.2f} M lane-pairs")
        print(f"  static group-128 union: mean {g128.mean():8.2f} "
              f" total (x128) {g128.sum()*128/1e6:8.2f} M lane-pairs",
              flush=True)


if __name__ == "__main__":
    main()
