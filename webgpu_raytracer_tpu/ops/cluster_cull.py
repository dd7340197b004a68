"""Tile-frustum vs triangle-cluster culling for the two-level dense sweep.

Large scenes (multi-tile WorldTris) cannot afford the full rays x triangles
sweep. This module computes, per RAY TILE (a contiguous group of lanes), the
list of triangle clusters (the 128-tri kernel tiles, already spatially
coherent in BLAS-leaf order) that any ray in the tile could possibly hit —
a conservative bounding-cone vs bounding-sphere test, all in a handful of
dense jnp ops. The Pallas kernel (ops/pallas_dense._run2) then loops over
only the surviving clusters for each tile, streaming their operand blocks
HBM->VMEM with double-buffered DMA.

This is the TPU-native analogue of the reference's TLAS traversal
(Raytracer.wgsl:496-528): the per-ray pointer chase is replaced by a
tile-granular broad phase (VPU-dense) + a cluster-granular narrow phase
(MXU matmuls), with survivors sorted near-to-far so the kernel's per-lane
running-best-t cull (the stackless scheme's front-to-back heuristic,
blas.rs:202-210) keeps shrinking the work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tile_cluster_worklist_exact(rayfT, t_max, spheres, m_tile: int,
                                chunk: int = 128, t_cap=None,
                                with_keys: bool = True):
    """EXACT per-lane sphere-interval worklists, unioned per ray tile.

    Replaces the cone broad phase with the same division-free ray/sphere
    interval test the kernel's cull() applies (ops/pallas_dense._kernel2),
    evaluated densely for all (lane, cluster) pairs in XLA and OR-reduced
    per m_tile lanes. The worklist is then the exact static-interval union:
    every surviving entry has at least one lane whose [t_min, t_max]
    segment touches the cluster sphere, so the kernel's scan-side cull
    admits most of them and the scan length drops to the union size
    (measured on `spheres` bounce tiles: 663 cone survivors vs ~250 exact;
    tools/pair_stats.py sized the per-group unions that bound this).

    Cost: R x Ct pair tests, chunked over clusters so the (chunk, R) bool
    intermediate never materializes at full width — dense VPU work that
    XLA fuses into ~2 reads of the ray components per chunk.

    Sort keys are the per-tile MIN WORLD-DISTANCE at which any lane's
    segment can touch the cluster (max(dist_entry, 0)), tighter than the
    cone path's center-distance key; the kernel's sorted early exit
    compares them against the per-tile open-interval reach as before.

    `t_cap` ((R,), ray-parameter units, optional) further clamps each
    lane's interval: the two-phase seeded sweep passes phase A's per-lane
    hit t here, so phase B's worklists shrink to the clusters a lane's
    REMAINING open interval can touch (a valid cull: the true closest hit
    satisfies t* <= t_cap, and any cluster containing it has entry <= t*).

    `with_keys=False` (the job-stream kernel, which has no sorted early
    exit): the pair test runs SQRT-FREE — sq >= A rewritten as
    A <= 0 | disc >= A^2 (valid since sq >= 0), with the interval ends
    nudged outward ~1e-6 relative so FP rounding of the squared form can
    only ADMIT extra boundary clusters, never drop one — and worklists
    come back survivors-first in CLUSTER-ID order (returned keys are the
    ids as f32). This removes the per-pair sqrt/divide/max chain and one
    (T, Ct) accumulator from the dense R x Ct loop, the cull's hot half.

    Same return contract as tile_cluster_worklist.
    """
    k, rp = rayfT.shape
    t_big = rp // m_tile
    d = rayfT[0:3]                                   # (3, R)
    o = rayfT[6:9]
    t_min = 1e-3
    dd = (d * d).sum(axis=0)                         # (R,)
    dlen = jnp.sqrt(dd)
    live = t_max > 0.0
    # Scene AABB slab exit cap in world units (see _run2's wcap): rays that
    # exit the scene box can't touch anything past the exit.
    live_c = spheres[:, 3] >= 0.0
    s_lo = jnp.min(jnp.where(live_c[:, None], spheres[:, 0:3]
                             - spheres[:, 3:4], jnp.float32(3e38)), axis=0)
    s_hi = jnp.max(jnp.where(live_c[:, None], spheres[:, 0:3]
                             + spheres[:, 3:4], jnp.float32(-3e38)), axis=0)
    t_exit = None
    for ax in range(3):
        d_safe = jnp.where(jnp.abs(d[ax]) > 1e-20, d[ax],
                           jnp.where(d[ax] >= 0.0, 1e-20, -1e-20))
        t1 = (s_lo[ax] - o[ax]) / d_safe
        t2 = (s_hi[ax] - o[ax]) / d_safe
        hi_ = jnp.maximum(t1, t2)
        t_exit = hi_ if t_exit is None else jnp.minimum(t_exit, hi_)
    t_clip = jnp.minimum(t_max, jnp.maximum(t_exit, 0.0))
    if t_cap is not None:
        t_clip = jnp.minimum(t_clip, t_cap)
    t_clip = jnp.where(live, t_clip, 0.0)

    ct = spheres.shape[0]
    nchunks = -(-ct // chunk)
    pad = nchunks * chunk - ct
    sph = jnp.pad(spheres[:, :4], ((0, pad), (0, 0)), constant_values=-1.0)

    def body_keys(c0, acc):
        poss_acc, key_acc = acc
        s = jax.lax.dynamic_slice(sph, (c0 * chunk, 0), (chunk, 4))
        cx, cy, cz, r = s[:, 0:1], s[:, 1:2], s[:, 2:3], s[:, 3:4]
        ocx = o[0][None, :] - cx
        ocy = o[1][None, :] - cy
        ocz = o[2][None, :] - cz
        b = d[0][None] * ocx + d[1][None] * ocy + d[2][None] * ocz
        cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = b * b - dd[None] * cc
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        ok = (disc >= 0.0) & (t_clip[None] > 0.0) & (r >= 0.0) \
            & (-b + sq >= dd[None] * t_min) & (-b - sq <= dd[None] * t_clip[None])
        # Min touch distance (world units) per pair; >= 0 (origin inside
        # the sphere clamps to 0, like the cone path's dist - rcp).
        entry_w = jnp.maximum((-b - sq) / dd[None] * dlen[None], 0.0)
        key = jnp.where(ok, entry_w, jnp.float32(3e38))
        okt = ok.reshape(chunk, t_big, m_tile).any(axis=2)       # (chunk, T)
        keyt = key.reshape(chunk, t_big, m_tile).min(axis=2)
        poss_acc = jax.lax.dynamic_update_slice(poss_acc, okt.T, (0, c0 * chunk))
        key_acc = jax.lax.dynamic_update_slice(key_acc, keyt.T, (0, c0 * chunk))
        return poss_acc, key_acc

    def body_nokeys(c0, poss_acc):
        s = jax.lax.dynamic_slice(sph, (c0 * chunk, 0), (chunk, 4))
        cx, cy, cz, r = s[:, 0:1], s[:, 1:2], s[:, 2:3], s[:, 3:4]
        ocx = o[0][None, :] - cx
        ocy = o[1][None, :] - cy
        ocz = o[2][None, :] - cz
        b = d[0][None] * ocx + d[1][None] * ocy + d[2][None] * ocz
        cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = b * b - dd[None] * cc
        # sq >= X  <=>  X <= 0 | disc >= X^2 (sq = sqrt(max(disc,0)) >= 0);
        # interval ends nudged ~1e-6 outward so the squared form's rounding
        # only ever ADMITS boundary clusters.
        a_lo = dd[None] * jnp.float32(t_min * (1.0 - 1e-6)) + b
        b_hi = dd[None] * (t_clip[None] * (1.0 + 1e-6)) + b
        ok = (disc >= 0.0) & (t_clip[None] > 0.0) & (r >= 0.0) \
            & ((a_lo <= 0.0) | (disc >= a_lo * a_lo)) \
            & ((b_hi >= 0.0) | (disc >= b_hi * b_hi))
        okt = ok.reshape(chunk, t_big, m_tile).any(axis=2)
        return jax.lax.dynamic_update_slice(poss_acc, okt.T, (0, c0 * chunk))

    if with_keys:
        possible, key = jax.lax.fori_loop(
            0, nchunks, body_keys,
            (jnp.zeros((t_big, nchunks * chunk), bool),
             jnp.full((t_big, nchunks * chunk), 3e38, jnp.float32)))
        possible = possible[:, :ct]
        key = jnp.where(possible, key[:, :ct], jnp.float32(3e38))
    else:
        possible = jax.lax.fori_loop(
            0, nchunks, body_nokeys,
            jnp.zeros((t_big, nchunks * chunk), bool))[:, :ct]
        ids = jnp.arange(ct, dtype=jnp.float32)[None, :]
        key = jnp.where(possible, ids, jnp.float32(3e38))

    counts = possible.sum(axis=1).astype(jnp.int32)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    keys_sorted = jnp.take_along_axis(key, order, axis=1)
    return order, keys_sorted, counts


def tile_cluster_worklist(rayfT, t_max, spheres, m_tile: int,
                          sub: int = 32, t_cap=None):
    """Conservative per-ray-tile cluster survivor lists.

    rayfT:   (16, Rp) transposed ray features (d=rows 0:3, o=rows 6:9)
    t_max:   (Rp,) per-lane max distance; <= 0 marks inactive lanes
    spheres: (Ct, 128) per-cluster [cx, cy, cz, r, pad...]; r < 0 = padding
    m_tile:  lanes per ray tile (Rp % m_tile == 0)
    sub:     cone granularity. The coherence sort makes a `sub`-lane group
             far tighter than the full tile (a 1024-lane tile spans a whole
             direction octant: measured 773 tile-cone survivors where only
             190 clusters ever win a lane; 32-lane subcones cut that ~3x).
             Cones are built per subtile and OR-reduced to tile granularity,
             so the kernel contract (one worklist per m_tile lanes) and the
             near-to-far keys are unchanged.

    Returns (order, keys, counts): order (T, Ct) i32 cluster indices with
    the `counts[t]` survivors first, sorted near-to-far; keys (T, Ct) the
    sorted min-reach distances; counts (T,) i32.
    """
    k, rp = rayfT.shape
    if m_tile % sub:
        sub = m_tile
    t_big = rp // m_tile
    group = m_tile // sub
    t = rp // sub
    d = rayfT[0:3].reshape(3, t, sub)
    o = rayfT[6:9].reshape(3, t, sub)
    act = (t_max > 0.0).reshape(t, sub)
    m_tile = sub
    n_act = jnp.maximum(act.sum(axis=1), 1)

    # Origin bounding sphere per tile (masked mean + max radius).
    co = jnp.where(act[None], o, 0.0).sum(axis=2) / n_act[None]  # (3, T)
    dist_o = jnp.sqrt(((o - co[:, :, None]) ** 2).sum(axis=0))
    r_o = jnp.where(act, dist_o, 0.0).max(axis=1)                # (T,)

    # Direction bounding cone per tile.
    dn = d / jnp.maximum(jnp.sqrt((d * d).sum(axis=0, keepdims=True)), 1e-20)
    a = jnp.where(act[None], dn, 0.0).sum(axis=2)
    a = a / jnp.maximum(jnp.sqrt((a * a).sum(axis=0, keepdims=True)), 1e-20)
    cos_t = jnp.where(act, (a[:, :, None] * dn).sum(axis=0), 1.0).min(axis=1)
    cos_t = jnp.clip(cos_t, -1.0, 1.0)                           # (T,)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))

    tile_live = act.any(axis=1)
    # t_max is in ray-parameter units; directions are NOT unit length for
    # primary camera rays (|d| ~ focus_dist, RTiOW convention). Convert to
    # world distance per lane before comparing against sphere distances.
    # Each lane's reach is additionally clamped by its EXIT of the scene
    # bounding sphere: rays that miss everything carry t_max = 1e30, which
    # would otherwise mark every cluster "reachable" for the whole tile.
    dlen = jnp.sqrt((d * d).sum(axis=0))
    live_c = spheres[:, 3] >= 0.0
    s_lo = jnp.min(jnp.where(live_c[:, None], spheres[:, 0:3]
                             - spheres[:, 3:4], jnp.float32(3e38)), axis=0)
    s_hi = jnp.max(jnp.where(live_c[:, None], spheres[:, 0:3]
                             + spheres[:, 3:4], jnp.float32(-3e38)), axis=0)
    # Scene-exit cap by AABB SLAB test, not bounding sphere: a giant ground
    # object (spheres preset: r=1000) inflates the bounding sphere so an
    # up-going bounce ray stays "inside" for ~1400 world units and the cap
    # never bites (measured: the kernel's sorted early exit fired on ZERO
    # bounce tiles). The box top sits just above the scene content, so the
    # slab exit for sky-going rays is tiny and the near-to-far loop stops
    # after a handful of clusters.
    d_safe = jnp.where(jnp.abs(d) > 1e-20, d,
                       jnp.where(d >= 0.0, 1e-20, -1e-20))
    t1 = (s_lo[:, None, None] - o) / d_safe           # (3, T, m)
    t2 = (s_hi[:, None, None] - o) / d_safe
    t_exit = jnp.maximum(t1, t2).min(axis=0)
    t_enter = jnp.minimum(t1, t2).max(axis=0)
    hit_box = (t_enter <= t_exit) & (t_exit > 0.0)
    exit_world = jnp.where(hit_box, t_exit, 0.0) * dlen
    reach_world = jnp.minimum(t_max.reshape(t, m_tile) * dlen, exit_world)
    if t_cap is not None:
        # Per-lane interval cap (ray-parameter units): the seeded two-phase
        # sweep passes phase A's hit t — a valid upper bound on each lane's
        # remaining open interval (see tile_cluster_worklist_exact t_cap).
        reach_world = jnp.minimum(
            reach_world, t_cap.reshape(t, m_tile) * dlen)
    tmax_tile = jnp.where(act, reach_world, 0.0).max(axis=1)

    cc = spheres[:, 0:3]                                          # (Ct, 3)
    rc = spheres[:, 3]                                            # (Ct,)
    rcp = rc[None, :] + r_o[:, None]                              # (T, Ct)
    v = cc[None] - co.T[:, None, :]                               # (T, Ct, 3)
    dist = jnp.sqrt((v * v).sum(axis=-1))                         # (T, Ct)

    inside = dist <= rcp
    cos_av = (a.T[:, None, :] * v).sum(-1) / jnp.maximum(dist, 1e-20)
    # Cone test in COSINE DOMAIN — the (T, Ct) pair map is the broad phase's
    # whole cost and arccos/arcsin are multi-cycle VPU polynomials (measured
    # 16.6 of the 19.7 ms jnp prefix at 512 tiles x 2009 clusters; this
    # rewrite needs only two sqrts). With alpha = angle(axis, cluster),
    # beta = angular radius, theta = cone half-angle, all in [0, pi]:
    #   alpha - beta <= theta
    #     <=>  theta + beta >= pi                  (then alpha <= pi always)
    #       OR cos(alpha) >= cos(theta + beta)     (cos decreasing on [0,pi])
    # and  theta + beta >= pi  <=>  cos_t <= -cos_b.
    sin_b = jnp.clip(rcp / jnp.maximum(dist, 1e-20), 0.0, 1.0)
    cos_b = jnp.sqrt(jnp.maximum(1.0 - sin_b * sin_b, 0.0))
    cos_sum = cos_b * cos_t[:, None] - sin_b * sin_t[:, None]
    hit_cone = (cos_t[:, None] <= -cos_b) | (
        jnp.clip(cos_av, -1.0, 1.0) >= cos_sum - 1e-6)
    reachable = (dist - rcp) <= tmax_tile[:, None]

    possible = (inside | hit_cone) & reachable & tile_live[:, None] \
        & (rc >= 0.0)[None, :]

    # Sort survivors by the MINIMUM ray distance at which the cluster can be
    # touched (dist - expanded radius): monotone in the sorted list, so the
    # kernel can terminate the cluster loop as soon as the next key exceeds
    # every lane's open interval (the stackless front-to-back heuristic,
    # blas.rs:202-210, at cluster granularity).
    reach_key = jnp.maximum(dist - rcp, 0.0)
    key = jnp.where(possible, reach_key, jnp.float32(3e38))

    if group > 1:  # OR-reduce subtile survivors to the kernel's tile grain
        possible = possible.reshape(t_big, group, -1).any(axis=1)
        key = key.reshape(t_big, group, -1).min(axis=1)

    counts = possible.sum(axis=1).astype(jnp.int32)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    keys_sorted = jnp.take_along_axis(key, order, axis=1)
    return order, keys_sorted, counts
