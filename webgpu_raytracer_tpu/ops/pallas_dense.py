"""Pallas TPU kernels: VMEM-blocked dense ray/triangle intersection + fetch.

Same contract as ops/dense.py (Plucker matmul sweep; see
render/worldtris.py) but blocked through VMEM so the (rays x tris)
intermediates never touch HBM:

  grid = (ray_tiles [parallel], tri_tiles [arbitrary/sequential])

Each step multiplies a (M, 16) ray-feature tile with a (16, 5C) triangle
coefficient tile on the MXU, combines the five column groups on the VPU, and
reduces into per-ray best-hit accumulators living in the revisited output
block across the sequential triangle dimension — the canonical Pallas
reduction pattern. Inactive rays are encoded as t_max <= 0.

The closest-hit kernel additionally emits the winner's shade-table row by
turning the winning column into a one-hot and multiplying with the tile's
(C, SHADE_K) shade slice — one extra small matmul instead of a separate
per-lane gather pass over HBM.

`pallas_fetch` is the standalone one-hot row fetch (used for NEE light rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..render.worldtris import FEAT_K, SHADE_K, WorldTris, ray_features

M_TILE = 1024   # rays per tile (matmul M)
C_TILE = 128    # triangles per tile (5 groups x C columns)
T_MAX = 1e30


def _tiled_features(wt: WorldTris):
    """(16, 5*Twp) grouped globally -> (n_tiles, 16, 5*C) grouped per tile."""
    twp = wt.v0.shape[0]
    n_tiles = twp // C_TILE
    f = wt.features.reshape(FEAT_K, 5, n_tiles, C_TILE)
    return f.transpose(2, 0, 1, 3).reshape(n_tiles, FEAT_K, 5 * C_TILE), n_tiles


def _kernel(valid_ref, rayf_ref, feat_ref, tmax_ref, shade_ref,
            out_t_ref, out_i_ref, out_row_ref, *,
            t_min: float, any_hit: bool, with_row: bool):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        if any_hit:
            out_t_ref[:] = jnp.zeros_like(out_t_ref)
        else:
            out_t_ref[:] = tmax_ref[:]
        out_i_ref[:] = jnp.full_like(out_i_ref, -1.0)
        if with_row:
            out_row_ref[:] = jnp.zeros_like(out_row_ref)

    res = jnp.dot(rayf_ref[:], feat_ref[0], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    s0 = res[:, 0 * C_TILE : 1 * C_TILE]
    s1 = res[:, 1 * C_TILE : 2 * C_TILE]
    s2 = res[:, 2 * C_TILE : 3 * C_TILE]
    tn = res[:, 3 * C_TILE : 4 * C_TILE]
    td = res[:, 4 * C_TILE : 5 * C_TILE]

    inside = (jnp.minimum(jnp.minimum(s0, s1), s2) >= 0.0) | (
        jnp.maximum(jnp.maximum(s0, s1), s2) <= 0.0
    )
    ok = inside & (jnp.abs(td) >= 1e-6)
    t = tn / jnp.where(ok, td, 1.0)

    col = j * C_TILE + jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
    ok = ok & (col < valid_ref[0]) & (t > t_min) & (t < tmax_ref[:])

    if any_hit:
        hit_any = jnp.max(ok.astype(jnp.float32), axis=1, keepdims=True)
        out_t_ref[:] = jnp.maximum(out_t_ref[:], hit_any)
    else:
        tm = jnp.where(ok, t, jnp.float32(T_MAX))
        cur_min = jnp.min(tm, axis=1, keepdims=True)
        cur_idx = jnp.min(
            jnp.where(tm <= cur_min, col, jnp.int32(2**30)), axis=1,
            keepdims=True,
        )
        upd = cur_min < out_t_ref[:]
        out_t_ref[:] = jnp.where(upd, cur_min, out_t_ref[:])
        out_i_ref[:] = jnp.where(upd, cur_idx.astype(jnp.float32),
                                 out_i_ref[:])
        if with_row:
            oh = ((col == cur_idx) & upd).astype(jnp.float32)
            row_new = jnp.dot(oh, shade_ref[0],
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
            out_row_ref[:] = jnp.where(upd, row_new, out_row_ref[:])


def _run(wt: WorldTris, ro, rd, t_max, active, t_min: float, any_hit: bool,
         with_row: bool):
    R = ro.shape[0]
    rayf = ray_features(ro, rd)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    t_max = jnp.where(active, t_max, 0.0)

    r_pad = (-R) % M_TILE
    if r_pad:
        rayf = jnp.pad(rayf, ((0, r_pad), (0, 0)))
        t_max = jnp.pad(t_max, (0, r_pad))
    rp = R + r_pad

    feats, n_tri_tiles = _tiled_features(wt)
    shade = wt.shade_table.reshape(n_tri_tiles, C_TILE, SHADE_K)
    n_ray_tiles = rp // M_TILE
    valid = wt.valid_count.reshape(1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_ray_tiles, n_tri_tiles),
        in_specs=[
            pl.BlockSpec((M_TILE, FEAT_K), lambda i, j, v: (i, 0)),
            pl.BlockSpec((1, FEAT_K, 5 * C_TILE), lambda i, j, v: (j, 0, 0)),
            pl.BlockSpec((M_TILE, 1), lambda i, j, v: (i, 0)),
            pl.BlockSpec((1, C_TILE, SHADE_K), lambda i, j, v: (j, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((M_TILE, 1), lambda i, j, v: (i, 0)),
            pl.BlockSpec((M_TILE, 1), lambda i, j, v: (i, 0)),
            pl.BlockSpec((M_TILE, SHADE_K), lambda i, j, v: (i, 0)),
        ],
    )

    out_t, out_i, out_row = pl.pallas_call(
        functools.partial(_kernel, t_min=t_min, any_hit=any_hit,
                          with_row=with_row),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rp, 1), jnp.float32),
            jax.ShapeDtypeStruct((rp, 1), jnp.float32),
            jax.ShapeDtypeStruct((rp, SHADE_K), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(valid, rayf, feats, t_max[:, None], shade)

    if any_hit:
        return out_t[:R, 0] > 0.0
    t = out_t[:R, 0]
    idx = out_i[:R, 0].astype(jnp.int32)
    if with_row:
        return t, idx, out_row[:R]
    return t, idx


def pallas_closest(wt: WorldTris, ro, rd, t_min=1e-3, t_max=T_MAX, active=None):
    if active is None:
        active = jnp.ones(ro.shape[0], bool)
    return _run(wt, ro, rd, t_max, active, float(t_min), any_hit=False,
                with_row=False)


def pallas_closest_with_row(wt: WorldTris, ro, rd, t_min=1e-3, t_max=T_MAX,
                            active=None):
    """Closest hit + fused shade-row fetch: (t, wt_idx, row (R, SHADE_K))."""
    if active is None:
        active = jnp.ones(ro.shape[0], bool)
    return _run(wt, ro, rd, t_max, active, float(t_min), any_hit=False,
                with_row=True)


def pallas_shadow(wt: WorldTris, ro, rd, t_max, t_min=1e-3, active=None):
    if active is None:
        active = jnp.ones(ro.shape[0], bool)
    return _run(wt, ro, rd, t_max, active, float(t_min), any_hit=True,
                with_row=False)


# ---------------------------------------------------------------------------
# Standalone one-hot row fetch
# ---------------------------------------------------------------------------


def _fetch_kernel(idx_ref, table_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    c = table_ref.shape[1]
    col = j * c + jax.lax.broadcasted_iota(jnp.int32, (idx_ref.shape[0], c), 1)
    oh = (idx_ref[:] == col).astype(jnp.float32)
    out_ref[:] += jnp.dot(oh, table_ref[0],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)


def pallas_fetch(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table (N, K) f32, idx (R,) i32 -> (R, K). N must be C_TILE-padded."""
    n, k = table.shape
    r = idx.shape[0]
    r_pad = (-r) % M_TILE
    idxp = jnp.pad(jnp.clip(idx, 0, n - 1), (0, r_pad), constant_values=-1)
    rp = r + r_pad
    n_pad = (-n) % C_TILE
    if n_pad:
        table = jnp.pad(table, ((0, n_pad), (0, 0)))
    n_tiles = (n + n_pad) // C_TILE
    tiled = table.reshape(n_tiles, C_TILE, k)

    out = pl.pallas_call(
        _fetch_kernel,
        grid=(rp // M_TILE, n_tiles),
        in_specs=[
            pl.BlockSpec((M_TILE, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, C_TILE, k), lambda i, j: (j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((M_TILE, k), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rp, k), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(idxp[:, None].astype(jnp.int32), tiled)
    return out[:r]
