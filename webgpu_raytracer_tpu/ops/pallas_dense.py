"""Pallas TPU kernels: VMEM-blocked dense ray/triangle intersection + fetch.

Same contract as ops/dense.py (Plucker matmul sweep; see
render/worldtris.py) but blocked through VMEM so the (rays x tris)
intermediates never touch HBM, and fully TRANSPOSED so rays always sit on
the 128-lane minor dimension:

  resT (5C, M) = featT (5C, 16) @ rayfT (16, M)     on the MXU
  per-ray reductions run over sublanes -> (1, M)
  winner rows: rowT (SHADE_K, M) = shadeT (SHADE_K, C) @ onehot (C, M)

  grid = (ray_tiles [parallel], tri_tiles [arbitrary/sequential])

Best-hit accumulators live in the revisited output block across the
sequential triangle dimension (canonical Pallas reduction pattern). Inactive
rays are encoded as t_max <= 0. All geometry matmuls run at HIGHEST
precision: the MXU's default bf16 passes visibly quantize hit distances.

Outputs are (1, R) / (SHADE_K, R): lanes-on-rays for the component-SoA
shading path (ops/dense_trace.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tune import DEFAULT_TUNE, TuneConfig
from ..render.worldtris import (FEAT_K, FEAT_K3, FEAT_P, SHADE_K, SHADE_KP,
                                WorldTris)

M_TILE = 2048   # rays per tile (lanes)
C_TILE = 128    # triangles per tile (large scenes)
T_MAX = 1e30
_HI = jax.lax.Precision.HIGHEST


def _split2(x):
    """f32 -> (hi, lo) bf16 pair: hi + lo carries ~16 mantissa bits.

    The optimization_barrier is load-bearing: under jit, XLA's
    excess-precision rule may cancel the f32->bf16->f32 round-trip
    (convert(convert(x, bf16), f32) -> x), which makes lo == 0 and
    silently degrades the split to plain bf16. The barrier hides the
    convert pair from the simplifier so the residual survives.
    """
    hi = x.astype(jnp.bfloat16)
    hi_exact = jax.lax.optimization_barrier(hi)
    lo = (x - hi_exact.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _kernel(scalars_ref, featk3_ref, rays8_ref, sph_ref, shadek3_ref,
            *out_refs,
            t_min: float, any_hit: bool, with_row: bool, c_tile: int):
    # scalars: [valid_tri_count (unused; padding tris self-cull via td==0),
    # first_row_tile] — ray tiles below first_row_tile skip the shade-row
    # fetch (the fused per-bounce call packs shadow lanes first; they never
    # read rows).
    # rays8: (8, M) f32 [rdx, rdy, rdz, rox, roy, roz, t_max, pad] — the
    # Plucker features + bf16x3 split operand are DERIVED IN-KERNEL, which
    # cuts the per-sweep input traffic from 328 KB to 64 KB per tile and
    # removes the jnp-side stack/split/concat fusions (~0.18 ms/bounce).
    if with_row:
        out_t_ref, out_i_ref, out_row_ref = out_refs
    else:
        out_t_ref, out_i_ref = out_refs
    i = pl.program_id(0)
    j = pl.program_id(1)

    dxv = rays8_ref[0:1, :]
    dyv = rays8_ref[1:2, :]
    dzv = rays8_ref[2:3, :]
    oxv = rays8_ref[3:4, :]
    oyv = rays8_ref[4:5, :]
    ozv = rays8_ref[5:6, :]
    tmax_v = rays8_ref[6:7, :]

    @pl.when(j == 0)
    def _init():
        if any_hit:
            out_t_ref[:] = jnp.zeros_like(out_t_ref)
        else:
            out_t_ref[:] = tmax_v
        out_i_ref[:] = jnp.full_like(out_i_ref, -1.0)
        if with_row:
            out_row_ref[:] = jnp.zeros_like(out_row_ref)

    # --- Cluster cull: skip this (ray tile, tri tile) step entirely when no
    # ray segment can touch the tile's bounding sphere. Division-free
    # ray/sphere interval test in f32; for closest-hit the per-lane interval
    # tightens with the running best t.
    cx, cy, cz, r = (sph_ref[0, 0, 0], sph_ref[0, 0, 1], sph_ref[0, 0, 2],
                     sph_ref[0, 0, 3])
    dx, dy, dz = dxv, dyv, dzv
    ocx = oxv - cx
    ocy = oyv - cy
    ocz = ozv - cz
    b = dx * ocx + dy * ocy + dz * ocz
    dd = dx * dx + dy * dy + dz * dz
    cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
    disc = b * b - dd * cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    if any_hit:
        lane_tmax = jnp.where(out_t_ref[:] > 0.0, 0.0, tmax_v)
    else:
        lane_tmax = jnp.minimum(tmax_v, out_t_ref[:])
    possible = (disc >= 0.0) & (lane_tmax > 0.0) \
        & (-b + sq >= dd * t_min) & (-b - sq <= dd * lane_tmax)
    any_possible = (r >= 0.0) & (jnp.max(possible.astype(jnp.float32)) > 0.0)

    @pl.when(any_possible)
    def _tile_work():
        # Ray features [d, o x d, o, 1, 0...] + bf16x3 split, derived here
        # per tile (VPU; operands stay in VMEM).
        mxv = oyv * dzv - ozv * dyv
        myv = ozv * dxv - oxv * dzv
        mzv = oxv * dyv - oyv * dxv
        onesv = jnp.ones_like(dxv)
        rayf = jnp.concatenate(
            [dxv, dyv, dzv, mxv, myv, mzv, oxv, oyv, ozv, onesv],
            axis=0)  # (FEAT_P, M) — only the meaningful rows
        # Cancellation-proof split: Mosaic lacks optimization_barrier, and
        # interpret mode inlines into XLA where the excess-precision rule
        # cancels a bf16 round trip (the round-1 wrong-hits bug). Masking
        # the low mantissa bits via bitcast creates no convert pair to
        # cancel; the f32->bf16 convert of the masked value is EXACT.
        xb = jax.lax.bitcast_convert_type(rayf, jnp.uint32)
        hi_f = jax.lax.bitcast_convert_type(xb & jnp.uint32(0xFFFF0000),
                                            jnp.float32)
        rh = hi_f.astype(jnp.bfloat16)
        rl = (rayf - hi_f).astype(jnp.bfloat16)
        zpad = jnp.zeros((FEAT_K3 - 3 * FEAT_P,) + rh.shape[1:], rh.dtype)
        rayk3 = jnp.concatenate([rh, rl, rh, zpad], axis=0)  # (K3, M)

        # bf16x3 split product: Mosaic's f32 dot is 6 bf16 passes (HIGHEST)
        # or a single quantizing pass (DEFAULT). The three significant cross
        # terms (fh@rh + fh@rl + fl@rh) are packed along K — ~f32 accuracy
        # (error ~2^-16 relative, validated vs the f64 oracle) in ONE pass
        # at 3x the systolic K-utilization.
        resT = jax.lax.dot_general(
            featk3_ref[0], rayk3,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        s0 = resT[0 * c_tile : 1 * c_tile]
        s1 = resT[1 * c_tile : 2 * c_tile]
        s2 = resT[2 * c_tile : 3 * c_tile]
        tn = resT[3 * c_tile : 4 * c_tile]
        td = s0 + s1 + s2  # Plucker identity: edge crosses sum to n

        inside = (jnp.minimum(jnp.minimum(s0, s1), s2) >= 0.0) | (
            jnp.maximum(jnp.maximum(s0, s1), s2) <= 0.0
        )
        # Padding/degenerate triangles self-cull here: their features are all
        # zero so td == 0 fails the epsilon test — no valid-count compare.
        ok = inside & (jnp.abs(td) >= 1e-6)
        t = tn / jnp.where(ok, td, 1.0)

        col = j * c_tile + jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
        ok = ok & (t > t_min) & (t < tmax_v)

        if any_hit:
            hit_any = jnp.max(ok.astype(jnp.float32), axis=0, keepdims=True)
            out_t_ref[:] = jnp.maximum(out_t_ref[:], hit_any)
            return
        tm = jnp.where(ok, t, jnp.float32(T_MAX))
        cur_min = jnp.min(tm, axis=0, keepdims=True)        # (1, M)
        cur_idx = jnp.min(
            jnp.where(tm <= cur_min, col, jnp.int32(2**30)), axis=0,
            keepdims=True,
        )                                                   # (1, M)
        upd = cur_min < out_t_ref[:]
        out_t_ref[:] = jnp.where(upd, cur_min, out_t_ref[:])
        out_i_ref[:] = jnp.where(upd, cur_idx.astype(jnp.float32),
                                 out_i_ref[:])
        if with_row:
            # One-hot row fetch: the pre-built 3-term bf16 split of the
            # shade table is EXACT (3x8 = 24 mantissa bits covers f32) and
            # the one-hot is exactly representable in bf16, so a single-pass
            # dot reproduces table rows bit-for-bit at 1/6 the HIGHEST cost.
            # The (C, M) one-hot block is reused for all three terms via a
            # tiled K so no in-kernel concat is needed: shadek3 columns are
            # ordered [hi | mid | lo] per tri tile and oh is stacked 3x.
            @pl.when(i >= scalars_ref[1])
            def _fetch_row():
                oh = ((col == cur_idx) & upd).astype(jnp.bfloat16)  # (C, M)
                oh3 = jnp.concatenate([oh, oh, oh], axis=0)         # (3C, M)
                rowT_new = jnp.dot(shadek3_ref[0], oh3,
                                   preferred_element_type=jnp.float32)
                out_row_ref[:] = jnp.where(upd, rowT_new[:SHADE_K],
                                           out_row_ref[:])


def rayf_from_components(rox, roy, roz, rdx, rdy, rdz):
    """Build the (16, R) transposed feature matrix [d, o x d, o, 1, pad]."""
    mx = roy * rdz - roz * rdy
    my = roz * rdx - rox * rdz
    mz = rox * rdy - roy * rdx
    ones = jnp.ones_like(rox)
    zeros = jnp.zeros_like(rox)
    return jnp.stack(
        [rdx, rdy, rdz, mx, my, mz, rox, roy, roz, ones,
         zeros, zeros, zeros, zeros, zeros, zeros], axis=0)


def _run(wt: WorldTris, ro, rd, t_max, active, t_min: float, any_hit: bool,
         with_row: bool, row_from_lane: int = 0, interpret: bool = False,
         tune: TuneConfig = DEFAULT_TUNE):
    """ro, rd are V3 components; t_max/active (R,). Returns transposed outs."""
    if wt.featk3.shape[0] > 1:
        # Multi-tile scene: the two-level culled sweep or the job stream.
        impl = _run3 if tune.narrow == "jobs" else _run2
        return impl(wt, ro, rd, t_max, active, t_min, any_hit, with_row,
                    row_from_lane, interpret=interpret, tune=tune)
    rox, roy, roz = ro
    rdx, rdy, rdz = rd
    R = rox.shape[0]
    ones = jnp.ones((R,), jnp.float32)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    t_max = jnp.where(active, t_max, 0.0)
    rays8 = jnp.stack([rdx * ones, rdy * ones, rdz * ones, rox * ones,
                       roy * ones, roz * ones, t_max,
                       jnp.zeros((R,), jnp.float32)], axis=0)

    r_pad = (-R) % M_TILE
    if r_pad:
        rays8 = jnp.pad(rays8, ((0, 0), (0, r_pad)))
    rp = R + r_pad

    # Scene-side operands (featk3 / spheres / shadek3) are precomputed per
    # scene update in build_world_tris — building them in-jit cost ~1.5 ms of
    # small-op dispatch PER SWEEP (measured on v5e, round 2). Ray-side
    # operands (Plucker features + bf16x3 split) are derived IN-KERNEL from
    # the slim (8, R) component stack.
    featk3 = wt.featk3
    spheres = wt.spheres
    shadek3 = wt.shadek3
    n_tri_tiles = featk3.shape[0]
    c = featk3.shape[2] // 4

    n_ray_tiles = rp // M_TILE
    first_row_tile = 0
    if with_row and row_from_lane and row_from_lane % M_TILE == 0:
        first_row_tile = row_from_lane // M_TILE
    scalars = jnp.stack([wt.valid_count.astype(jnp.int32),
                         jnp.asarray(first_row_tile, jnp.int32)])

    out_specs = [
        pl.BlockSpec((1, M_TILE), lambda i, j, v: (0, i)),
        pl.BlockSpec((1, M_TILE), lambda i, j, v: (0, i)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1, rp), jnp.float32),
        jax.ShapeDtypeStruct((1, rp), jnp.float32),
    ]
    if with_row:
        # Rows are emitted ONLY for lanes >= row_from_lane (the fused call's
        # closest half): shadow tiles map to one trailing dummy block (their
        # never-written buffer copy-out lands there, order-independent), so
        # the row output is half-sized and the caller needs no 40-row slice.
        frt = first_row_tile
        n_row_blocks = n_ray_tiles - frt + (1 if frt else 0)
        out_specs.append(pl.BlockSpec(
            (SHADE_K, M_TILE),
            lambda i, j, v, frt=frt, nb=n_row_blocks:
                (0, jnp.where(i < frt, nb - 1, i - frt))))
        out_shape.append(jax.ShapeDtypeStruct(
            (SHADE_K, n_row_blocks * M_TILE), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_ray_tiles, n_tri_tiles),
        in_specs=[
            pl.BlockSpec((1, FEAT_K3, 4 * c), lambda i, j, v: (j, 0, 0)),
            pl.BlockSpec((8, M_TILE), lambda i, j, v: (0, i)),
            pl.BlockSpec((1, 1, 128), lambda i, j, v: (j, 0, 0)),
            pl.BlockSpec((1, SHADE_KP, 3 * c), lambda i, j, v: (j, 0, 0)),
        ],
        out_specs=out_specs,
    )

    outs = pl.pallas_call(
        functools.partial(_kernel, t_min=t_min, any_hit=any_hit,
                          with_row=with_row, c_tile=c),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(scalars, featk3, rays8, spheres, shadek3)

    out_t, out_i = outs[0], outs[1]
    if any_hit:
        return out_t[0, :R] > 0.0
    t = out_t[0, :R]
    idx = out_i[0, :R].astype(jnp.int32)
    if with_row:
        # Contract: rows are returned for lanes [row_from_lane:] only.
        start = row_from_lane - first_row_tile * M_TILE
        rows = outs[2][:, start:start + (R - row_from_lane)]
        return t, idx, rows
    return t, idx


# ---------------------------------------------------------------------------
# Two-level sweep for multi-tile scenes: per ray tile, loop over only the
# clusters surviving the tile-cone cull (ops/cluster_cull.py), streaming
# their operand blocks HBM->VMEM with double-buffered manual DMA.
# ---------------------------------------------------------------------------


# The two-level sweep's measured A/B knobs (coherence-sort key shape,
# prefetch depth, matmul batching, kernel ablations) live in
# ops/tune.TuneConfig and are threaded explicitly from the tracer entry
# points — see that module for what each field trades.


def _kernel2(scal_ref, surv_ref, dist_ref, rayk3_ref, cull8_ref, tmax_ref,
             *more_refs,
             t_min: float, any_hit: bool, with_row: bool, c_tile: int,
             with_stats: bool = False, debug: str = "", depth: int = 1,
             batch: int = 1, scan_batch: int = 1, seeded: bool = False):
    # scal: [first_row_tile, count_0, count_1, ...]
    # surv: (1, 1, Ctp) SMEM — sorted surviving cluster ids for this tile
    # dist: (1, 1, Ctp) SMEM — matching sorted min-reach keys (monotone)
    # cull8: (8*n_sub, 128) — cull operands VREG-TILED: lane l = (s*128 + c)
    # of the tile sits at sublane s, lane c, so per-cluster cull math runs on
    # FULL (n_sub, 128) vregs instead of 1/8th-occupied (1, M) rows. Rows
    # [j*n_sub:(j+1)*n_sub] = component j of [dx, dy, dz, ox, oy, oz, dlen,
    # wcap, tmax] (wcap = world-unit scene-slab reach cap, 0 for box-miss
    # lanes — precomputed in the _run2 prefix, was per-tile kernel code).
    assert not seeded or (with_row and not any_hit)
    more_refs = list(more_refs)
    # seeded: phase-A row output (SHADE_KP, M) precedes the sphere table —
    # its SHADE_K / SHADE_K+1 mirror rows carry the seed t / idx.
    seedrow_ref = more_refs.pop(0) if seeded else None
    sph_ref, featk3_hbm, shadek3_hbm = more_refs[:3]
    refs = more_refs[3:]
    stats_ref = refs.pop(2 + with_row) if with_stats else None
    if with_row:
        out_t_ref, out_i_ref, out_row_ref = refs[:3]
        (feat_buf, shade_buf, semf, sems, open8, maxt_s, qk_s,
         committed, upd1024) = refs[3:]
    else:
        out_t_ref, out_i_ref = refs[:2]
        (feat_buf, shade_buf, semf, sems, open8, maxt_s, qk_s,
         committed, upd1024) = refs[2:]
    i = pl.program_id(0)
    count = scal_ref[1 + i]
    row_on = scal_ref[0] <= i

    n_sub = cull8_ref.shape[0] // 9
    dx8 = cull8_ref[0 * n_sub:1 * n_sub, :]
    dy8 = cull8_ref[1 * n_sub:2 * n_sub, :]
    dz8 = cull8_ref[2 * n_sub:3 * n_sub, :]
    ox8 = cull8_ref[3 * n_sub:4 * n_sub, :]
    oy8 = cull8_ref[4 * n_sub:5 * n_sub, :]
    oz8 = cull8_ref[5 * n_sub:6 * n_sub, :]
    dlen8 = cull8_ref[6 * n_sub:7 * n_sub, :]
    wcap8 = cull8_ref[7 * n_sub:8 * n_sub, :]
    tmax8 = cull8_ref[8 * n_sub:9 * n_sub, :]
    dd8 = dx8 * dx8 + dy8 * dy8 + dz8 * dz8

    if seeded:
        # Seeded init: accumulators continue from phase A's output. The
        # open interval starts at the seeded t (min with tmax is a no-op —
        # phase A's out_t is tmax-bounded — kept for clarity).
        out_row_ref[:] = seedrow_ref[:]
        out_t_ref[:] = seedrow_ref[SHADE_K:SHADE_K + 1, :]
        out_i_ref[:] = seedrow_ref[SHADE_K + 1:SHADE_K + 2, :]
        t8s = out_t_ref[:].reshape(n_sub, 128)
        open8[:] = jnp.minimum(tmax8, t8s)
        maxt_s[0] = jnp.max(jnp.minimum(open8[:] * dlen8, wcap8))
    else:
        if any_hit:
            out_t_ref[:] = jnp.zeros_like(out_t_ref)
        else:
            out_t_ref[:] = tmax_ref[:]
        out_i_ref[:] = jnp.full_like(out_i_ref, -1.0)
        # Per-lane OPEN INTERVAL (t-units) + tile max reach (world units,
        # scalar): cached in scratch and refreshed only when a processed
        # cluster COMMITS (rare) — the skip-dominated survivor loop reads
        # them for free instead of recomputing (1, M) reductions every
        # iteration.
        open8[:] = tmax8
        maxt_s[0] = jnp.max(jnp.minimum(tmax8 * dlen8, wcap8))
        if with_row:
            # Rows SHADE_K / SHADE_K+1 mirror the t / idx accumulators so
            # the epilogue recovers everything with ONE row-major gather.
            out_row_ref[:] = jnp.zeros_like(out_row_ref)
            out_row_ref[SHADE_K:SHADE_K + 1, :] = out_t_ref[:]
            out_row_ref[SHADE_K + 1:SHADE_K + 2, :] = out_i_ref[:]

    # Queue position p (0..depth-1) lands in batch buffer p // batch at
    # column slice p % batch, so a full batch sits contiguous for ONE
    # stacked matmul over (FEAT_K3, batch * 4c).
    def dma_feat(k, pos):
        cidx = surv_ref[0, 0, k]
        return pltpu.make_async_copy(
            featk3_hbm.at[cidx],
            feat_buf.at[pos // batch, :,
                        pl.ds(jax.lax.rem(pos, batch) * 4 * c_tile,
                              4 * c_tile)],
            semf.at[pos])

    def dma_shade(k, pos):
        cidx = surv_ref[0, 0, k]
        return pltpu.make_async_copy(
            shadek3_hbm.at[cidx],
            shade_buf.at[pos // batch, :,
                         pl.ds(jax.lax.rem(pos, batch) * 3 * c_tile,
                               3 * c_tile)],
            sems.at[pos])

    def refresh_open():
        """Recompute the cached open interval + scalar tile reach from the
        accumulators — called ONLY when a processed cluster commits."""
        t8 = out_t_ref[:].reshape(n_sub, 128)
        if any_hit:
            new_open = jnp.where(t8 > 0.0, 0.0, tmax8)
        else:
            new_open = jnp.minimum(tmax8, t8)
        open8[:] = new_open
        maxt_s[0] = jnp.max(jnp.minimum(new_open * dlen8, wcap8))

    def interval_possible(cidx):
        """Per-lane sphere-interval test vs the cached open interval: which
        lanes of the tile could still hit cluster `cidx`. Shared by the
        scan-side cull (any-lane gate on DMA+matmul) and the process-side
        WINDOW gate (per-128-lane-sublane-row epilogue skipping)."""
        sph = sph_ref[pl.ds(cidx, 1), :]  # (1, 128) [cx, cy, cz, r, ...]
        cx, cy, cz, r = sph[0, 0], sph[0, 1], sph[0, 2], sph[0, 3]
        ocx = ox8 - cx
        ocy = oy8 - cy
        ocz = oz8 - cz
        b = dx8 * ocx + dy8 * ocy + dz8 * ocz
        cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = b * b - dd8 * cc
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        lt = open8[:]
        return ((disc >= 0.0) & (lt > 0.0)
                & (-b + sq >= dd8 * t_min) & (-b - sq <= dd8 * lt))

    def cull(k):
        """Any-lane gate for sorted-survivor k: gates both the DMA and the
        matmul, so skipped clusters cost only this test (a handful of
        full-vreg VPU ops on the (n_sub, 128) cull operands)."""
        hit = jnp.max(
            interval_possible(surv_ref[0, 0, k]).astype(jnp.float32)) > 0.0
        if debug == "nocull":
            return hit | True
        return hit


    def process_batch(nproc, nv):
        """Intersect the `nv` (<= batch) oldest queued clusters against the
        ray tile with ONE stacked matmul, then run WINDOWED epilogues.

        One full-tile matmul per batch: gating the matmul per 128-lane
        group was measured ~4x SLOWER per processed cluster (MXU cost is
        pipeline-fill-dominated at K=32 — (4C, 32) x (32, 128) costs nearly
        as much as x (32, 1024)), so both M and the stacked output rows are
        nearly free and the matmul amortizes across the batch. nproc is
        always batch-aligned when nv == batch (mid-scan processing only
        fires on full batches; partial batches only drain the final tail),
        so a batch always sits inside one buffer.

        The EPILOGUE is the VPU floor of the survivor loop (the (4C, M)
        elementwise chain + reductions scale with clusters x lanes), and
        most of it is wasted: a processed cluster is typically needed by a
        handful of lanes, not the whole tile. Each cluster therefore
        re-runs the sphere-interval test at process time (against the
        CURRENT open interval — tighter than the scan-time cull that
        enqueued it) and runs the epilogue only on the 128-lane WINDOWS
        (sublane rows of the vreg-tiled cull operands = static 128-column
        slices of resT) with a surviving lane. Skipped windows cannot
        change the output: the cluster bounding sphere contains its
        triangles, so a lane whose window fails the interval test against
        open8 (== the running best, since out_t <= tmax always) has no
        triangle hit below its running best — the same containment
        argument that makes the scan-side cull exact. Commits run
        sequentially per (cluster, window) with strict <, which is
        identical to the old combined earlier-batch-wins-ties order.
        Stale FEATURE positions past nv are never read (every window
        epilogue is gated on nv > b) so the feat half needs no zeroing —
        but the SHADE half must be zeroed on short drains: the row-fetch
        one-hot matmul contracts over the WHOLE batch-wide buffer, and
        0 x garbage is not 0 once the garbage is NaN (uninitialized VMEM
        on the first partial drain)."""
        pos0 = jax.lax.rem(nproc, depth)
        buf = pos0 // batch
        dma_feat(qk_s[pos0], pos0).wait()
        if with_row:
            dma_shade(qk_s[pos0], pos0).wait()
        for b in range(1, batch):
            @pl.when(nv > b)
            def _wait_b(b=b):
                dma_feat(qk_s[pos0 + b], pos0 + b).wait()
                if with_row:
                    dma_shade(qk_s[pos0 + b], pos0 + b).wait()
            if with_row:
                @pl.when(nv <= b)
                def _zero_shade(b=b):
                    shade_buf[buf, :, pl.ds(b * 3 * c_tile, 3 * c_tile)] = (
                        jnp.zeros((shade_buf.shape[1], 3 * c_tile),
                                  shade_buf.dtype))

        resT = jax.lax.dot_general(
            feat_buf[buf], rayk3_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        committed[0] = jnp.int32(0)
        if with_row:
            upd1024[:] = jnp.zeros_like(upd1024)
        for b in range(batch):
            base = 4 * b * c_tile
            cidx_b = surv_ref[0, 0, qk_s[jnp.minimum(pos0 + b, depth - 1)]]
            possible = interval_possible(cidx_b).astype(jnp.float32)
            if debug == "nocull":
                possible = possible + 1.0
            # ONE vector reduction packs all window flags into a scalar
            # (window w set -> bit w): per-window gates are then scalar-core
            # bit tests, not 8 separate vector-to-scalar reductions.
            wflags = (jnp.max(possible, axis=1, keepdims=True)
                      > 0.0).astype(jnp.int32)
            wbits = jnp.sum(wflags << jax.lax.broadcasted_iota(
                jnp.int32, (n_sub, 1), 0))
            if debug == "allwin":   # ablation: windowed code, no skipping
                wbits = wbits | jnp.int32((1 << n_sub) - 1)
            for w in range(n_sub):
                wflag = (wbits & (1 << w)) > 0

                @pl.when(wflag & (nv > b))
                def _window(b=b, w=w, base=base, cidx_b=cidx_b):
                    sl = slice(w * 128, (w + 1) * 128)
                    s0 = resT[base + 0 * c_tile: base + 1 * c_tile, sl]
                    s1 = resT[base + 1 * c_tile: base + 2 * c_tile, sl]
                    s2 = resT[base + 2 * c_tile: base + 3 * c_tile, sl]
                    tn = resT[base + 3 * c_tile: base + 4 * c_tile, sl]
                    td = s0 + s1 + s2  # Plucker identity: edge crosses
                    inside = (jnp.minimum(jnp.minimum(s0, s1), s2) >= 0.0) \
                        | (jnp.maximum(jnp.maximum(s0, s1), s2) <= 0.0)
                    ok = inside & (jnp.abs(td) >= 1e-6)
                    t = tn / jnp.where(ok, td, 1.0)
                    ok = ok & (t > t_min) & (t < tmax_ref[:, sl])
                    if any_hit:
                        h = jnp.max(ok.astype(jnp.float32), axis=0,
                                    keepdims=True)
                        out_t_ref[:, sl] = jnp.maximum(out_t_ref[:, sl], h)
                        committed[0] = jnp.int32(1)
                        return
                    tm = jnp.where(ok, t, jnp.float32(T_MAX))
                    col = cidx_b * c_tile + jax.lax.broadcasted_iota(
                        jnp.int32, tm.shape, 0)
                    bmin = jnp.min(tm, axis=0, keepdims=True)
                    upd = bmin < out_t_ref[:, sl]
                    any_upd = jnp.max(upd.astype(jnp.float32)) > 0.0

                    @pl.when(any_upd)
                    def _commit():
                        committed[0] = jnp.int32(1)
                        bidx = jnp.min(
                            jnp.where(tm <= bmin, col, jnp.int32(2 ** 30)),
                            axis=0, keepdims=True)
                        new_t = jnp.where(upd, bmin, out_t_ref[:, sl])
                        new_i = jnp.where(upd, bidx.astype(jnp.float32),
                                          out_i_ref[:, sl])
                        out_t_ref[:, sl] = new_t
                        out_i_ref[:, sl] = new_i
                        if with_row:
                            upd1024[:, sl] = jnp.where(
                                upd, 1.0, upd1024[:, sl])

        # One interval/reach refresh + (with_row) ONE full-M row fetch per
        # COMMITTING batch: a per-window one-hot matmul is fill-bound
        # (K = 3C) and measured ~2x the whole frame's row cost — the fetch
        # must amortize across the batch like the matmul does. upd1024
        # marks the lanes any window of this batch improved; the winner of
        # each such lane is out_i (column ids are globally unique), so the
        # old batch-combined one-hot reconstructs exactly.
        @pl.when(committed[0] > 0)
        def _refresh():
            refresh_open()
            if with_row:
                out_row_ref[SHADE_K:SHADE_K + 1, :] = out_t_ref[:]
                out_row_ref[SHADE_K + 1:SHADE_K + 2, :] = out_i_ref[:]

                @pl.when(row_on)
                def _fetch_row():
                    updm = upd1024[:] > 0.0
                    win = out_i_ref[:].astype(jnp.int32)
                    parts = []
                    for b in range(batch):
                        cidx_b = surv_ref[
                            0, 0, qk_s[jnp.minimum(pos0 + b, depth - 1)]]
                        col_b = cidx_b * c_tile + jax.lax.broadcasted_iota(
                            jnp.int32, (c_tile, out_i_ref.shape[1]), 0)
                        oh_b = ((col_b == win) & updm
                                & (nv > b)).astype(jnp.bfloat16)
                        parts.extend([oh_b, oh_b, oh_b])
                    oh3 = jnp.concatenate(parts, axis=0)
                    rowT_new = jnp.dot(shade_buf[buf], oh3,
                                       preferred_element_type=jnp.float32)
                    out_row_ref[0:SHADE_K, :] = jnp.where(
                        updm, rowT_new[:SHADE_K], out_row_ref[0:SHADE_K, :])

    # Prefetch-queue survivor loop: the SCAN (cull + DMA-start) runs up to
    # `depth` surviving clusters ahead of PROCESSING, so a survivor's HBM
    # copy hides behind ~depth cluster processings instead of a single cull.
    # Each iteration either scans one worklist entry or processes the oldest
    # queued cluster (queue full, or scan finished). Scanning culls against
    # the open interval as of scan time — conservative: a stale (wider)
    # interval only admits extra clusters whose hits are >= the running
    # best, and commits use strict <, so outputs are bit-identical to the
    # depth-1 loop. The scan terminates once the next sorted min-reach key
    # (world units) exceeds every lane's open interval (maxt_s — cached
    # scalar, refreshed on commit); keys are sorted, so everything after an
    # unreachable entry is unreachable too.
    def cond(carry):
        s, nfound, nproc, scan_done = carry
        return jnp.logical_not(scan_done & (nproc == nfound))

    def body(carry):
        s, nfound, nproc, scan_done = carry
        # Scan up to `scan_batch` worklist entries per iteration (each only
        # while the queue has a free slot): the Mosaic while-loop's ~300-
        # cycle branch/carry overhead amortizes across the scans, which
        # matters once exact worklists make the scan the iteration count's
        # floor. Dense survivor runs then enqueue scan_batch and drain one
        # process-batch per iteration.
        for _u in range(scan_batch):
            do_scan = jnp.logical_not(scan_done) & (nfound - nproc < depth)
            s_c = jnp.minimum(s, surv_ref.shape[2] - 1)  # clamp for the read
            live = (s < count) & (dist_ref[0, 0, s_c] <= maxt_s[0])
            ok = do_scan & live & cull(s_c)

            @pl.when(ok)
            def _enqueue(s_c=s_c, nfound=nfound):
                slot = jax.lax.rem(nfound, depth)
                qk_s[slot] = s_c
                if debug != "noproc":
                    dma_feat(s_c, slot).start()
                    if with_row:
                        dma_shade(s_c, slot).start()

            nfound = nfound + ok.astype(jnp.int32)
            scan_done = scan_done | (do_scan & jnp.logical_not(live))
            s = jnp.where(do_scan, s + 1, s)
        # Process the oldest queued BATCH once the queue is full (its DMAs
        # then have ~depth-batch processings of lead) or the scan is
        # finished (draining in batches, with one short tail at most).
        do_process = (nfound - nproc >= depth) | (
            scan_done & (nfound > nproc))
        nv = jnp.minimum(nfound - nproc, batch)

        @pl.when(do_process)
        def _proc():
            if debug != "noproc":
                process_batch(nproc, nv)

        return (s, nfound, nproc + jnp.where(do_process, nv, 0), scan_done)

    k_end, _, nproc, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.int32(0), jnp.int32(0),
         jnp.logical_not(count > 0)))
    if with_stats:
        # [iterations, processed, worklist count, 0...] per ray tile
        # (vector select — Mosaic cannot store scalars to VMEM).
        lanei = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.where(lanei == 0, k_end.astype(jnp.float32), 0.0)
        row = jnp.where(lanei == 1, nproc.astype(jnp.float32), row)
        row = jnp.where(lanei == 2, count.astype(jnp.float32), row)
        stats_ref[:] = row


def _coherence_sort(ro, rd, t_max, active, m_tile: int, seg_start: int,
                    sph_flat, tune: TuneConfig):
    """Shared _run2/_run3 prefix: pad to tiles + the coherence-sort permute.

    Returns (sorted components (rox..rdz, t_max), rayfT, rayk3, inv_perm,
    rp, smin, sext). See the _run2 call site for the measured rationale
    (octant + origin-cell key; key_stats.py round-5 re-check: this key
    beats nearest-cluster orderings at every group granularity)."""
    rox, roy, roz = ro
    rdx, rdy, rdz = rd
    R = rox.shape[0]
    ones = jnp.ones((R,), jnp.float32)
    rox, roy, roz = rox * ones, roy * ones, roz * ones
    rdx, rdy, rdz = rdx * ones, rdy * ones, rdz * ones
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    t_max = jnp.where(active, t_max, 0.0)

    r_pad = (-R) % m_tile
    if r_pad:
        rox, roy, roz, rdx, rdy, rdz, t_max = (
            jnp.pad(x, (0, r_pad))
            for x in (rox, roy, roz, rdx, rdy, rdz, t_max))
    rp = R + r_pad

    live = sph_flat[:, 3] >= 0.0
    smin = jnp.min(jnp.where(live[:, None], sph_flat[:, 0:3]
                             - sph_flat[:, 3:4], jnp.float32(3e38)), axis=0)
    sext = jnp.maximum(
        jnp.max(jnp.where(live[:, None], sph_flat[:, 0:3] + sph_flat[:, 3:4],
                          jnp.float32(-3e38)), axis=0) - smin, 1e-20)
    lane_live = t_max > 0.0
    key = jnp.zeros((rp,), jnp.int32)
    octant = jnp.zeros((rp,), jnp.int32)
    for a, (o_c, d_c) in enumerate(((rox, rdx), (roy, rdy), (roz, rdz))):
        cl = 1 << tune.cell_bits
        if tune.key_mode == "obox":
            o_lo = jnp.min(jnp.where(lane_live, o_c, jnp.float32(3e38)))
            o_ext = jnp.maximum(
                jnp.max(jnp.where(lane_live, o_c, jnp.float32(-3e38)))
                - o_lo, 1e-20)
            # Lens-noise guard: thin-lens PRIMARY rays all originate on the
            # camera's lens disk, so the live-origin bbox is the lens and
            # obox cells quantize LENS-SAMPLE NOISE — scrambling raster
            # coherence within each direction bin (measured: the spheres
            # primary sweep at lens_radius 0.052 ran 217-344 ms vs 75-81 ms
            # pinhole, round 5). Culling only cares about origin variation
            # at cluster scale, so the cell width is floored at
            # sext / 2^cell_floor_bits: sub-floor origin spreads collapse
            # to ONE cell and the stable argsort preserves raster order.
            cell_w = jnp.maximum(
                o_ext * (1.0 / cl),
                sext[a] * (2.0 ** -tune.cell_floor_bits))
        else:
            o_lo = smin[a]
            cell_w = sext[a] * (1.0 / cl)
        q = jnp.clip(((o_c - o_lo) / cell_w)
                     .astype(jnp.int32), 0, cl - 1)
        key = key * cl + q
        if tune.dir_bits == 1:
            octant = octant * 2 + (d_c < 0.0).astype(jnp.int32)
        else:
            dl_all = jnp.sqrt(rdx * rdx + rdy * rdy + rdz * rdz)
            dn = d_c / jnp.maximum(dl_all, 1e-20)
            lv = 1 << tune.dir_bits
            qd = jnp.clip(((dn + 1.0) * (0.5 * lv)).astype(jnp.int32),
                          0, lv - 1)
            octant = octant * lv + qd
    dir_span = 1 << (3 * tune.dir_bits)
    cell_span = 1 << (3 * tune.cell_bits)
    key = octant * cell_span + key
    key = jnp.where(t_max > 0.0, key, jnp.int32(cell_span * dir_span))
    seg = (jnp.arange(rp, dtype=jnp.int32) >= seg_start).astype(jnp.int32)
    perm = jnp.argsort(key + seg * jnp.int32(2 * cell_span * dir_span))
    # Inverse permutation by scatter (one pass) instead of a second argsort.
    inv_perm = jnp.zeros((rp,), jnp.int32).at[perm].set(
        jnp.arange(rp, dtype=jnp.int32), unique_indices=True)
    comps = jnp.stack([rox, roy, roz, rdx, rdy, rdz, t_max,
                       jnp.zeros_like(t_max)], axis=1)      # (rp, 8)
    sortedT = comps[perm, :].T                              # (8, rp)
    rox, roy, roz = sortedT[0], sortedT[1], sortedT[2]
    rdx, rdy, rdz = sortedT[3], sortedT[4], sortedT[5]
    t_max = sortedT[6]
    rayfT = rayf_from_components(rox, roy, roz, rdx, rdy, rdz)

    rh, rl = _split2(rayfT[:FEAT_P])
    zpad = jnp.zeros((FEAT_K3 - 3 * FEAT_P, rp), rh.dtype)
    rayk3 = jnp.concatenate([rh, rl, rh, zpad], axis=0)  # (K3, rp)
    return ((rox, roy, roz, rdx, rdy, rdz, t_max), rayfT, rayk3, inv_perm,
            rp, smin, sext)


def _run2(wt: WorldTris, ro, rd, t_max, active, t_min: float, any_hit: bool,
          with_row: bool, row_from_lane: int = 0, interpret: bool = False,
          with_stats: bool = False, tune: TuneConfig = DEFAULT_TUNE):
    """Two-level sweep: cull clusters per ray tile, then loop survivors.

    with_stats=True appends a (T, 3) float32 array to the return tuple:
    per ray tile [loop iterations, clusters processed, worklist count]
    (tooling only; see tools/stats_spheres.py)."""
    from .cluster_cull import (tile_cluster_worklist,
                               tile_cluster_worklist_exact)

    # The queue buffers are laid out as (depth // batch) batch-contiguous
    # blocks; partial drains zero per-position — both assume batch | depth.
    assert tune.prefetch_depth % tune.proc_batch == 0, (
        "TuneConfig.proc_batch must divide prefetch_depth "
        f"({tune.proc_batch} vs {tune.prefetch_depth})")
    m_tile2 = tune.m_tile2

    featk3 = wt.featk3                    # (Ct, 5C, 3K) bf16 — stays in HBM
    shadek3 = wt.shadek3                  # (Ct, SHADE_K, 3C) bf16 — HBM
    sph_flat = wt.spheres[:, 0, :]        # (Ct, 128) f32
    n_clusters = featk3.shape[0]
    c = featk3.shape[2] // 4

    R = ro[0].shape[0]
    first_row_tile = 0
    if with_row and row_from_lane and row_from_lane % m_tile2 == 0:
        first_row_tile = row_from_lane // m_tile2

    # --- Coherence sort (the wavefront reorder). Tile-granular cone culling
    # is useless on incoherent bounce rays (measured on `spheres`: 2009/2009
    # clusters survive random directions), so permute lanes so each M_TILE2
    # tile shares a direction octant + origin cell; the tile cone then prunes
    # most clusters. Dead lanes (t_max==0) sort to the segment end, turning
    # whole tiles dead (count==0 -> kernel skips them): per-bounce ray
    # compaction for free. The two fused segments (shadow | closest rays,
    # split at row_from_lane) sort independently so the row-fetch tile split
    # stays aligned. Data movement: argsort (0.5 ms at 512k) + ROW-MAJOR
    # row gathers — an (R, 8) row gather is ~11 ms where 7 separate (R,)
    # column gathers cost ~43 ms, and multi-operand lax.sort (runtime-free)
    # is ruled out by its comparator compile cost (~220 s for 43 operands).
    (comps_s, rayfT, rayk3, inv_perm, rp, smin, sext) = _coherence_sort(
        ro, rd, t_max, active, m_tile2, first_row_tile * m_tile2,
        sph_flat, tune)
    rox, roy, roz, rdx, rdy, rdz, t_max = comps_s

    if tune.exact_cull:
        order, keys, counts = tile_cluster_worklist_exact(
            rayfT, t_max, sph_flat, m_tile2)
    else:
        order, keys, counts = tile_cluster_worklist(rayfT, t_max, sph_flat,
                                                    m_tile2, sub=tune.subtile)
    # Cull operands, VREG-TILED (see _kernel2 docstring): per tile a
    # (9 * n_sub, 128) block of [dx, dy, dz, ox, oy, oz, dlen, wcap, tmax]
    # where wcap is the world-unit scene-slab reach cap — a lane that exits
    # the scene bounding BOX can't hit anything past that exit; without it,
    # miss lanes carry t_max = 1e30 and defeat the sorted early termination
    # for their whole tile. (Box, not bounding sphere: a giant ground object
    # makes the sphere so fat sky-going rays never exit it — measured on
    # `spheres`.)
    n_sub = m_tile2 // 128
    dlen = jnp.sqrt(rdx * rdx + rdy * rdy + rdz * rdz)
    s_hi = smin + sext
    t_exit = None
    t_enter = None
    for ax, (o_c, d_c) in enumerate(((rox, rdx), (roy, rdy), (roz, rdz))):
        d_safe = jnp.where(jnp.abs(d_c) > 1e-20, d_c,
                           jnp.where(d_c >= 0.0, 1e-20, -1e-20))
        t1 = (smin[ax] - o_c) / d_safe
        t2 = (s_hi[ax] - o_c) / d_safe
        hi_ = jnp.maximum(t1, t2)
        lo_ = jnp.minimum(t1, t2)
        t_exit = hi_ if t_exit is None else jnp.minimum(t_exit, hi_)
        t_enter = lo_ if t_enter is None else jnp.maximum(t_enter, lo_)
    hit_box = (t_enter <= t_exit) & (t_exit > 0.0)
    wcap = jnp.where(hit_box, t_exit, 0.0) * dlen
    n_ray_tiles = rp // m_tile2
    cull8 = jnp.stack([rdx, rdy, rdz, rox, roy, roz, dlen, wcap, t_max],
                      axis=0)                              # (9, rp)
    cull8 = cull8.reshape(9, n_ray_tiles, n_sub, 128) \
        .transpose(1, 0, 2, 3).reshape(n_ray_tiles * 9 * n_sub, 128)
    ct_pad = (-n_clusters) % 128

    def launch(order, keys, counts, seed_row=None, stats=False):
        if ct_pad:
            order = jnp.pad(order, ((0, 0), (0, ct_pad)))
            keys = jnp.pad(keys, ((0, 0), (0, ct_pad)),
                           constant_values=jnp.float32(3e38))
        order = order[:, None, :]  # (T, 1, Ctp) — Mosaic block-friendly
        keys = keys[:, None, :]
        scal = jnp.concatenate([
            jnp.asarray([first_row_tile], jnp.int32), counts])

        out_specs = [
            pl.BlockSpec((1, m_tile2), lambda i, v: (0, i)),
            pl.BlockSpec((1, m_tile2), lambda i, v: (0, i)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((1, rp), jnp.float32),
            jax.ShapeDtypeStruct((1, rp), jnp.float32),
        ]
        if with_row:
            # SHADE_KP rows: 0:SHADE_K = winner shade rows, SHADE_K /
            # SHADE_K+1 mirror t / idx so ONE row-major gather un-permutes
            # everything.
            out_specs.append(pl.BlockSpec((SHADE_KP, m_tile2),
                                          lambda i, v: (0, i)))
            out_shape.append(jax.ShapeDtypeStruct((SHADE_KP, rp),
                                                  jnp.float32))
        if stats:
            out_specs.append(pl.BlockSpec((1, 128), lambda i, v: (0, i)))
            out_shape.append(jax.ShapeDtypeStruct((1, n_ray_tiles * 128),
                                                  jnp.float32))

        in_specs = [
            pl.BlockSpec((1, 1, order.shape[2]), lambda i, v: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, order.shape[2]), lambda i, v: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((FEAT_K3, m_tile2), lambda i, v: (0, i)),
            pl.BlockSpec((9 * n_sub, 128), lambda i, v: (i, 0)),
            pl.BlockSpec((1, m_tile2), lambda i, v: (0, i)),
        ]
        operands = [scal, order, keys, rayk3, cull8, t_max[None, :]]
        if seed_row is not None:
            in_specs.append(pl.BlockSpec((SHADE_KP, m_tile2),
                                         lambda i, v: (0, i)))
            operands.append(seed_row)
        in_specs += [
            # cluster-sphere table, resident in VMEM
            pl.BlockSpec((n_clusters, 128), lambda i, v: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),   # featk3 (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # shadek3 (HBM)
        ]
        operands += [sph_flat, featk3, shadek3]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_ray_tiles,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((tune.prefetch_depth // tune.proc_batch, FEAT_K3,
                            tune.proc_batch * 4 * c), jnp.bfloat16),
                pltpu.VMEM((tune.prefetch_depth // tune.proc_batch,
                            SHADE_KP, tune.proc_batch * 3 * c),
                           jnp.bfloat16),
                pltpu.SemaphoreType.DMA((tune.prefetch_depth,)),
                pltpu.SemaphoreType.DMA((tune.prefetch_depth,)),
                pltpu.VMEM((n_sub, 128), jnp.float32),   # open8
                pltpu.SMEM((1,), jnp.float32),           # maxt_s
                pltpu.SMEM((tune.prefetch_depth,), jnp.int32),  # queued idx
                pltpu.SMEM((1,), jnp.int32),             # committed flag
                pltpu.VMEM((1, m_tile2), jnp.float32),   # upd1024
            ],
        )

        return pl.pallas_call(
            functools.partial(_kernel2, t_min=t_min, any_hit=any_hit,
                              with_row=with_row, c_tile=c,
                              with_stats=stats, debug=tune.debug2,
                              depth=tune.prefetch_depth,
                              batch=tune.proc_batch,
                              scan_batch=tune.scan_batch,
                              seeded=seed_row is not None),
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(*operands)

    two_phase = bool(tune.seed_k) and with_row and not any_hit \
        and tune.exact_cull
    if two_phase:
        # Phase A: sweep only the nearest seed_k worklist entries per tile
        # (the near-to-far head — cheap, and for surface-launched rays it
        # usually finds the actual closest hit). Phase B: re-cull with each
        # lane's phase-A t as its interval cap (tile_cluster_worklist_exact
        # t_cap) and continue from the seeded accumulators. Tiles fully
        # processed in phase A (count <= seed_k) are skipped outright.
        outs_a = launch(order, keys, jnp.minimum(counts, tune.seed_k))
        row_a = outs_a[2]
        order_b, keys_b, counts_b = tile_cluster_worklist_exact(
            rayfT, t_max, sph_flat, m_tile2, t_cap=row_a[SHADE_K])
        counts_b = jnp.where(counts <= tune.seed_k, 0, counts_b)
        outs = launch(order_b, keys_b, counts_b, seed_row=row_a,
                      stats=with_stats)
    else:
        outs = launch(order, keys, counts, stats=with_stats)

    # Un-permute: with_row recovers rows + t + idx with ONE (R, SHADE_KP)
    # row-major gather; the slim paths use single-vector gathers.
    out_t, out_i = outs[0], outs[1]
    stats = ((outs[-1].reshape(n_ray_tiles, 128)[:, :3],)
             if with_stats else ())
    if any_hit:
        out = out_t[0, inv_perm[:R]] > 0.0
        return (out,) + stats if with_stats else out
    if with_row:
        backT = outs[2].T[inv_perm[:R], :].T        # (SHADE_KP, R)
        t = backT[SHADE_K]
        idx = backT[SHADE_K + 1].astype(jnp.int32)
        # Contract: rows for lanes [row_from_lane:] only.
        return (t, idx, backT[:SHADE_K, row_from_lane:]) + stats
    inv = inv_perm[:R]
    out = (out_t[0, inv], out_i[0, inv].astype(jnp.int32))
    return out + stats


# ---------------------------------------------------------------------------
# Job-stream narrow phase: per-GROUP exact worklists consumed straight
# through — no in-kernel culling, no scan machinery.
# ---------------------------------------------------------------------------


def _kernel3(scal_ref, surv_ref, rayk3_ref, tmax_ref, *more_refs,
             t_min: float, any_hit: bool, with_row: bool, c_tile: int,
             depth: int, batch: int, seeded: bool = False):
    """Job-stream kernel: one grid step per RAY GROUP (m_tile3 lanes); the
    group's exact-cull worklist (sorted near-to-far) is processed start to
    finish with `depth`-deep pipelined DMA, `batch` clusters per stacked
    matmul.

    Versus _kernel2 this drops the whole scan half (per-entry interval
    cull, open-interval cache, sorted early exit, windowed epilogue): at
    group granularity the XLA-side exact cull already did the pruning
    (tools/job_stats.py: per-128-group unions are 2.6x tighter in
    lane-pairs than per-1024-tile ones, and in-kernel running-best
    tightening is worth only ~17% more), so the kernel's only job is to
    keep the MXU fed. Worklist consumption is branch-free: a fori_loop
    over ceil(count/batch) stacked matmul + epilogue steps.

    Commit order is the sorted worklist order with strict <, matching
    _kernel2's earlier-batch-wins-ties semantics over the same sorted
    list."""
    assert not seeded or (with_row and not any_hit)
    more_refs = list(more_refs)
    seedrow_ref = more_refs.pop(0) if seeded else None
    featk3_hbm, shadek3_hbm = more_refs[:2]
    refs = list(more_refs[2:])
    if with_row:
        out_t_ref, out_i_ref, out_row_ref = refs[:3]
        feat_buf, shade_buf, semf, sems, upd_g, committed = refs[3:]
    else:
        out_t_ref, out_i_ref = refs[:2]
        feat_buf, shade_buf, semf, sems, upd_g, committed = refs[2:]
    i = pl.program_id(0)
    count = scal_ref[1 + i]
    row_on = scal_ref[0] <= i

    if seeded:
        # Continue from phase A's accumulators (t/idx mirrors included).
        out_row_ref[:] = seedrow_ref[:]
        out_t_ref[:] = seedrow_ref[SHADE_K:SHADE_K + 1, :]
        out_i_ref[:] = seedrow_ref[SHADE_K + 1:SHADE_K + 2, :]
    else:
        if any_hit:
            out_t_ref[:] = jnp.zeros_like(out_t_ref)
        else:
            out_t_ref[:] = tmax_ref[:]
        out_i_ref[:] = jnp.full_like(out_i_ref, -1.0)
        if with_row:
            out_row_ref[:] = jnp.zeros_like(out_row_ref)
            out_row_ref[SHADE_K:SHADE_K + 1, :] = out_t_ref[:]
            out_row_ref[SHADE_K + 1:SHADE_K + 2, :] = out_i_ref[:]

    def dma_feat(k, pos):
        cidx = surv_ref[0, 0, k]
        return pltpu.make_async_copy(
            featk3_hbm.at[cidx],
            feat_buf.at[pos // batch, :,
                        pl.ds(jax.lax.rem(pos, batch) * 4 * c_tile,
                              4 * c_tile)],
            semf.at[pos])

    def dma_shade(k, pos):
        cidx = surv_ref[0, 0, k]
        return pltpu.make_async_copy(
            shadek3_hbm.at[cidx],
            shade_buf.at[pos // batch, :,
                         pl.ds(jax.lax.rem(pos, batch) * 3 * c_tile,
                               3 * c_tile)],
            sems.at[pos])

    # Prologue: fill the DMA queue `depth` entries deep.
    for p in range(depth):
        @pl.when(p < count)
        def _pre(p=p):
            dma_feat(p, p).start()
            if with_row:
                dma_shade(p, p).start()

    def body(bi, carry):
        k0 = bi * batch
        pos0 = jax.lax.rem(k0, depth)
        buf = pos0 // batch
        nv = jnp.minimum(count - k0, batch)
        dma_feat(k0, pos0).wait()
        if with_row:
            dma_shade(k0, pos0).wait()
        for b in range(1, batch):
            @pl.when(nv > b)
            def _wait_b(b=b):
                dma_feat(k0 + b, pos0 + b).wait()
                if with_row:
                    dma_shade(k0 + b, pos0 + b).wait()
            if with_row:
                # Short drains zero the shade slice: the one-hot row fetch
                # contracts the whole batch-wide buffer and 0 x NaN != 0
                # (same hazard as _kernel2, commit 3395142).
                @pl.when(nv <= b)
                def _zero_shade(b=b):
                    shade_buf[buf, :, pl.ds(b * 3 * c_tile, 3 * c_tile)] = (
                        jnp.zeros((shade_buf.shape[1], 3 * c_tile),
                                  shade_buf.dtype))

        resT = jax.lax.dot_general(
            feat_buf[buf], rayk3_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        committed[0] = jnp.int32(0)
        if with_row:
            upd_g[:] = jnp.zeros_like(upd_g)
        for b in range(batch):
            base = 4 * b * c_tile

            @pl.when(nv > b)
            def _one(b=b, base=base):
                s0 = resT[base + 0 * c_tile: base + 1 * c_tile, :]
                s1 = resT[base + 1 * c_tile: base + 2 * c_tile, :]
                s2 = resT[base + 2 * c_tile: base + 3 * c_tile, :]
                tn = resT[base + 3 * c_tile: base + 4 * c_tile, :]
                td = s0 + s1 + s2  # Plucker identity
                inside = (jnp.minimum(jnp.minimum(s0, s1), s2) >= 0.0) \
                    | (jnp.maximum(jnp.maximum(s0, s1), s2) <= 0.0)
                ok = inside & (jnp.abs(td) >= 1e-6)
                t = tn / jnp.where(ok, td, 1.0)
                ok = ok & (t > t_min) & (t < tmax_ref[:])
                if any_hit:
                    h = jnp.max(ok.astype(jnp.float32), axis=0,
                                keepdims=True)
                    out_t_ref[:] = jnp.maximum(out_t_ref[:], h)
                    return
                tm = jnp.where(ok, t, jnp.float32(T_MAX))
                cidx_b = surv_ref[0, 0, k0 + b]
                col = cidx_b * c_tile + jax.lax.broadcasted_iota(
                    jnp.int32, tm.shape, 0)
                bmin = jnp.min(tm, axis=0, keepdims=True)
                upd = bmin < out_t_ref[:]
                any_upd = jnp.max(upd.astype(jnp.float32)) > 0.0

                @pl.when(any_upd)
                def _commit():
                    committed[0] = jnp.int32(1)
                    bidx = jnp.min(
                        jnp.where(tm <= bmin, col, jnp.int32(2 ** 30)),
                        axis=0, keepdims=True)
                    out_t_ref[:] = jnp.where(upd, bmin, out_t_ref[:])
                    out_i_ref[:] = jnp.where(upd, bidx.astype(jnp.float32),
                                             out_i_ref[:])
                    if with_row:
                        upd_g[:] = jnp.where(upd, 1.0, upd_g[:])

        if with_row:
            # One row fetch per COMMITTING batch (amortized over the batch
            # like _kernel2's): reconstruct each improved lane's winner via
            # the globally-unique column ids.
            @pl.when(committed[0] > 0)
            def _refresh():
                out_row_ref[SHADE_K:SHADE_K + 1, :] = out_t_ref[:]
                out_row_ref[SHADE_K + 1:SHADE_K + 2, :] = out_i_ref[:]

                @pl.when(row_on)
                def _fetch_row():
                    updm = upd_g[:] > 0.0
                    win = out_i_ref[:].astype(jnp.int32)
                    parts = []
                    for b in range(batch):
                        cidx_b = surv_ref[
                            0, 0, jnp.minimum(k0 + b, count - 1)]
                        col_b = cidx_b * c_tile + jax.lax.broadcasted_iota(
                            jnp.int32, (c_tile, out_i_ref.shape[1]), 0)
                        oh_b = ((col_b == win) & updm
                                & (nv > b)).astype(jnp.bfloat16)
                        parts.extend([oh_b, oh_b, oh_b])
                    oh3 = jnp.concatenate(parts, axis=0)
                    rowT_new = jnp.dot(shade_buf[buf], oh3,
                                       preferred_element_type=jnp.float32)
                    out_row_ref[0:SHADE_K, :] = jnp.where(
                        updm, rowT_new[:SHADE_K], out_row_ref[0:SHADE_K, :])

        # Refill the queue: the entries that will land in this buffer slot.
        for b in range(batch):
            kn = k0 + depth + b

            @pl.when(kn < count)
            def _next(kn=kn, b=b):
                dma_feat(kn, pos0 + b).start()
                if with_row:
                    dma_shade(kn, pos0 + b).start()
        return carry

    nb = (count + batch - 1) // batch
    jax.lax.fori_loop(0, nb, body, jnp.int32(0))


def _run3(wt: WorldTris, ro, rd, t_max, active, t_min: float, any_hit: bool,
          with_row: bool, row_from_lane: int = 0, interpret: bool = False,
          with_stats: bool = False, tune: TuneConfig = DEFAULT_TUNE):
    """Job-stream narrow phase at group granularity tune.m_tile3.

    Same contract as _run2. with_stats returns the per-group worklist count
    in all three stat columns (the kernel has no scan/process distinction)."""
    from .cluster_cull import tile_cluster_worklist_exact

    assert tune.prefetch_depth % tune.proc_batch == 0, (
        "TuneConfig.proc_batch must divide prefetch_depth "
        f"({tune.proc_batch} vs {tune.prefetch_depth})")
    g = tune.m_tile3
    depth, batch = tune.prefetch_depth, tune.proc_batch

    featk3 = wt.featk3
    shadek3 = wt.shadek3
    sph_flat = wt.spheres[:, 0, :]
    n_clusters = featk3.shape[0]
    c = featk3.shape[2] // 4

    R = ro[0].shape[0]
    first_row_tile = 0
    if with_row and row_from_lane and row_from_lane % g == 0:
        first_row_tile = row_from_lane // g

    (comps_s, rayfT, rayk3, inv_perm, rp, smin, sext) = _coherence_sort(
        ro, rd, t_max, active, g, first_row_tile * g, sph_flat, tune)
    t_max = comps_s[6]

    def cull(t_cap=None):
        if tune.cull_sub:
            from .cluster_cull import tile_cluster_worklist

            return tile_cluster_worklist(rayfT, t_max, sph_flat, g,
                                         sub=tune.cull_sub, t_cap=t_cap)
        # Near-to-far keys only matter to the SEEDED mode's phase-A head;
        # the job-stream kernel has no sorted early exit, so the default
        # path takes the sqrt-free id-ordered cull.
        return tile_cluster_worklist_exact(rayfT, t_max, sph_flat, g,
                                           t_cap=t_cap,
                                           with_keys=bool(tune.seed_k))

    order, keys, counts = cull()

    ct_pad = (-n_clusters) % 128
    n_groups = rp // g

    def launch(order, counts, seed_row=None):
        if ct_pad:
            order = jnp.pad(order, ((0, 0), (0, ct_pad)))
        order = order[:, None, :]
        scal = jnp.concatenate([
            jnp.asarray([first_row_tile], jnp.int32), counts])

        out_specs = [
            pl.BlockSpec((1, g), lambda i, v: (0, i)),
            pl.BlockSpec((1, g), lambda i, v: (0, i)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((1, rp), jnp.float32),
            jax.ShapeDtypeStruct((1, rp), jnp.float32),
        ]
        if with_row:
            out_specs.append(pl.BlockSpec((SHADE_KP, g),
                                          lambda i, v: (0, i)))
            out_shape.append(jax.ShapeDtypeStruct((SHADE_KP, rp),
                                                  jnp.float32))

        in_specs = [
            pl.BlockSpec((1, 1, order.shape[2]), lambda i, v: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((FEAT_K3, g), lambda i, v: (0, i)),
            pl.BlockSpec((1, g), lambda i, v: (0, i)),
        ]
        operands = [scal, order, rayk3, t_max[None, :]]
        if seed_row is not None:
            in_specs.append(pl.BlockSpec((SHADE_KP, g),
                                         lambda i, v: (0, i)))
            operands.append(seed_row)
        in_specs += [
            pl.BlockSpec(memory_space=pl.ANY),   # featk3 (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # shadek3 (HBM)
        ]
        operands += [featk3, shadek3]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_groups,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((depth // batch, FEAT_K3, batch * 4 * c),
                           jnp.bfloat16),
                pltpu.VMEM((depth // batch, SHADE_KP, batch * 3 * c),
                           jnp.bfloat16),
                pltpu.SemaphoreType.DMA((depth,)),
                pltpu.SemaphoreType.DMA((depth,)),
                pltpu.VMEM((1, g), jnp.float32),     # upd_g
                pltpu.SMEM((1,), jnp.int32),         # committed flag
            ],
        )

        return pl.pallas_call(
            functools.partial(_kernel3, t_min=t_min, any_hit=any_hit,
                              with_row=with_row, c_tile=c,
                              depth=depth, batch=batch,
                              seeded=seed_row is not None),
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(*operands)

    if tune.seed_k and with_row and not any_hit:
        # Group-granularity seeded two-phase: phase A sweeps only the
        # nearest seed_k sorted entries per group; the cull re-runs with
        # each lane's phase-A hit t as its interval cap; phase B continues
        # from the seeded accumulators over the (much shorter) re-culled
        # worklists. At g=128 the capped union tracks the per-lane need
        # closely — unlike the failed 1024-lane-tile variant, where the
        # union was a tile-granularity artifact (tools/job_stats.py).
        outs_a = launch(order, jnp.minimum(counts, tune.seed_k))
        row_a = outs_a[2]
        order_b, _, counts_b = cull(t_cap=row_a[SHADE_K])
        counts_b = jnp.where(counts <= tune.seed_k, 0, counts_b)
        outs = launch(order_b, counts_b, seed_row=row_a)
    else:
        outs = launch(order, counts)

    out_t, out_i = outs[0], outs[1]
    stats = ()
    if with_stats:
        cf = counts.astype(jnp.float32)[:, None]
        stats = (jnp.concatenate([cf, cf, cf], axis=1),)
    if any_hit:
        out = out_t[0, inv_perm[:R]] > 0.0
        return (out,) + stats if with_stats else out
    if with_row:
        backT = outs[2].T[inv_perm[:R], :].T        # (SHADE_KP, R)
        t = backT[SHADE_K]
        idx = backT[SHADE_K + 1].astype(jnp.int32)
        return (t, idx, backT[:SHADE_K, row_from_lane:]) + stats
    inv = inv_perm[:R]
    out = (out_t[0, inv], out_i[0, inv].astype(jnp.int32))
    return out + stats


def _v3_of(arr):
    """Accept (R,3) row-major arrays at the boundary (legacy callers)."""
    if isinstance(arr, tuple):
        return arr
    return (arr[:, 0], arr[:, 1], arr[:, 2])


def pallas_closest(wt: WorldTris, ro, rd, t_min=1e-3, t_max=T_MAX,
                   active=None, tune: TuneConfig = DEFAULT_TUNE):
    ro, rd = _v3_of(ro), _v3_of(rd)
    if active is None:
        active = jnp.ones(ro[0].shape[0], bool)
    return _run(wt, ro, rd, t_max, active, float(t_min), any_hit=False,
                with_row=False, tune=tune)


def pallas_closest_with_row(wt: WorldTris, ro, rd, t_min=1e-3, t_max=T_MAX,
                            active=None, row_from_lane: int = 0,
                            interpret: bool = False,
                            tune: TuneConfig = DEFAULT_TUNE):
    """Closest hit + fused shade-row fetch: (t, idx, rowT).

    row_from_lane: lanes below this index skip the row fetch, and the
    returned rowT covers lanes [row_from_lane:] ONLY (shape
    (SHADE_K, R - row_from_lane)) — the fused shadow+next sweep's shadow
    half never reads rows, so no 40-row copy materializes for it."""
    ro, rd = _v3_of(ro), _v3_of(rd)
    if active is None:
        active = jnp.ones(ro[0].shape[0], bool)
    return _run(wt, ro, rd, t_max, active, float(t_min), any_hit=False,
                with_row=True, row_from_lane=row_from_lane,
                interpret=interpret, tune=tune)


def pallas_shadow(wt: WorldTris, ro, rd, t_max, t_min=1e-3, active=None,
                  tune: TuneConfig = DEFAULT_TUNE):
    ro, rd = _v3_of(ro), _v3_of(rd)
    if active is None:
        active = jnp.ones(ro[0].shape[0], bool)
    return _run(wt, ro, rd, t_max, active, float(t_min), any_hit=True,
                with_row=False, tune=tune)


# ---------------------------------------------------------------------------
# Standalone one-hot row fetch (transposed: returns (K, R))
# ---------------------------------------------------------------------------


def _fetch_kernel(idx_ref, tableT_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    c = tableT_ref.shape[2]
    m = idx_ref.shape[1]
    col = j * c + jax.lax.broadcasted_iota(jnp.int32, (c, m), 0)
    oh = (col == idx_ref[:]).astype(jnp.float32)  # (C, M)
    out_ref[:] += jnp.dot(tableT_ref[0], oh,
                          preferred_element_type=jnp.float32, precision=_HI)


def pallas_fetch_t(table: jnp.ndarray, idx: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    """table (N, K) f32, idx (R,) i32 -> transposed rows (K, R)."""
    n, k = table.shape
    r = idx.shape[0]
    r_pad = (-r) % M_TILE
    idxp = jnp.pad(jnp.clip(idx, 0, n - 1), (0, r_pad), constant_values=-1)
    rp = r + r_pad
    n_pad = (-n) % C_TILE
    if n_pad:
        table = jnp.pad(table, ((0, n_pad), (0, 0)))
    n_tiles = (n + n_pad) // C_TILE
    tiledT = table.T.reshape(k, n_tiles, C_TILE).transpose(1, 0, 2)

    out = pl.pallas_call(
        _fetch_kernel,
        grid=(rp // M_TILE, n_tiles),
        in_specs=[
            pl.BlockSpec((1, M_TILE), lambda i, j: (0, i)),
            pl.BlockSpec((1, k, C_TILE), lambda i, j: (j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((k, M_TILE), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((k, rp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(idxp[None, :].astype(jnp.int32), tiledT)
    return out[:, :r]


def pallas_fetch(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row-major convenience wrapper: (R, K)."""
    return pallas_fetch_t(table, idx).T


# ---------------------------------------------------------------------------
# Kronecker one-hot fetch: row index factored hi*128 + lo, table resident in
# VMEM as bf16x3 planes (ops/fetch.build_tex_kron layout).
# ---------------------------------------------------------------------------


def _kron_kernel(idx_ref, t2_ref, out_ref, *, k_cols: int, lo: int):
    hi = t2_ref.shape[1]
    m = idx_ref.shape[1]
    idx = idx_ref[:]                                        # (1, M) i32
    hi_i = idx // lo
    lo_i = idx - hi_i * lo
    a = (jax.lax.broadcasted_iota(jnp.int32, (hi, m), 0)
         == hi_i).astype(jnp.bfloat16)                      # (hi, M)
    b = (jax.lax.broadcasted_iota(jnp.int32, (lo, m), 0)
         == lo_i).astype(jnp.float32)                       # (lo, M)
    # One matmul selects every (plane, lo) row of the lane's hi-block:
    # exact — the one-hot is exact in bf16 and each output element has a
    # single nonzero product of two bf16 values accumulated in f32.
    tmp = jnp.dot(t2_ref[:], a, preferred_element_type=jnp.float32)
    rows = []
    for kk in range(k_cols):
        acc = None
        for p in range(3):
            blk = tmp[(kk * 3 + p) * lo:(kk * 3 + p + 1) * lo, :]
            s = jnp.sum(blk * b, axis=0, keepdims=True)     # (1, M)
            acc = s if acc is None else acc + s
        rows.append(acc)
    for _ in range(out_ref.shape[0] - k_cols):              # sublane pad
        rows.append(jnp.zeros_like(rows[0]))
    out_ref[:] = jnp.concatenate(rows, axis=0)


def pallas_fetch_kron(t2: jnp.ndarray, idx: jnp.ndarray, k_cols: int,
                      interpret: bool = False) -> jnp.ndarray:
    """t2 (3*k_cols*128, hi) bf16 planes, idx (R,) i32 -> (k_cols, R) f32.

    Exact f32 row reconstruction (bf16x3 planes sum bit-for-bit); per-lane
    cost is hi + 128 one-hot compares and 24*N matmul MACs — the MXU-served
    gather for tables up to ops/fetch.KRON_MAX_ROWS rows."""
    from .fetch import KRON_LO

    r = idx.shape[0]
    m = 1024
    r_pad = (-r) % m
    hi = t2.shape[1]
    k_pad = max(8, k_cols)
    idxp = jnp.pad(jnp.clip(idx, 0, hi * KRON_LO - 1), (0, r_pad))
    rp = r + r_pad
    out = pl.pallas_call(
        functools.partial(_kron_kernel, k_cols=k_cols, lo=KRON_LO),
        grid=(rp // m,),
        in_specs=[
            pl.BlockSpec((1, m), lambda i: (0, i)),
            pl.BlockSpec(t2.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((k_pad, m), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((k_pad, rp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(idxp[None, :].astype(jnp.int32), t2)
    return out[:k_cols, :r]
