"""World-space triangle tables: the dense (MXU) intersection backend's data.

TPU-first redesign of the hot path: instead of the reference's two-level
TLAS/BLAS pointer chase (Raytracer.wgsl:455-528) — which on a vector machine
degenerates into per-lane gathers — every instance's triangles are flattened
into world space once per scene update, and intersection becomes a dense
rays x triangles sweep expressed as matmuls on the MXU (ops/dense.py /
ops/pallas_dense.py). Shading attributes are likewise baked per world
triangle so the bounce loop fetches one row per hit instead of chasing
topology -> vertices -> instance pointers.

The ray/triangle test is the Plucker-coordinate form: for a ray (o, d) with
moment m = o x d, the signed side of edge (a, b) is
    s = d . (a x b) + m . (b - a)
which is LINEAR in the 6-vector [d, m] — so the three edge tests of every
triangle are one (R,6) @ (6, 3T) matmul. The hit distance comes from the
plane equation: t = (n.v0 - n.o) / (n.d), linear in [d, o, 1]. A triangle is
hit when all three s agree in sign (equivalent to Moller-Trumbore u,v tests;
same 1e-6 determinant epsilon since a = -(n.d)).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

# Feature-vector layout (K = 16): [d(3), m(3), o(3), 1, pad(6)]
FEAT_K = 16
# Meaningful feature rows: only the first 10 are nonzero. The packed MXU
# operand (featk3/rayk3) keeps JUST these, so the bf16x3 contraction runs
# at K = 32 instead of 48 — MXU feed cycles scale with K, so the sweep's
# dominant matmul drops a third of its cost for free (rows 10-15 multiply
# structural zeros).
FEAT_P = 10
FEAT_K3 = 32  # 3 * FEAT_P rounded up to a bf16-sublane (16) multiple
# Column groups per triangle: s0, s1, s2, t_num, t_den
N_GROUPS = 5

# shade_table column layout (SHADE_K = 40):
SHADE_COLS = dict(
    v0=(0, 3), e1=(3, 6), e2=(6, 9),
    n0=(9, 12), n1=(12, 15), n2=(15, 18),
    uv0=(18, 20), uv1=(20, 22), uv2=(22, 24),
    base_color=(24, 27), mat=(27, 28), mrir=(28, 31),
    tex=(31, 35), emissive=(35, 38), tri_idx=(38, 39), inst_idx=(39, 40),
)
SHADE_K = 40
SHADE_KP = 48  # shade rows padded to a bf16 sublane multiple for DMA tiling


class WorldTris(NamedTuple):
    """Per-world-triangle SoA (Tw = padded world triangle count)."""

    # Intersection feature table, (FEAT_K, N_GROUPS * Tw): columns grouped as
    # [all s0 | all s1 | all s2 | all t_num | all t_den].
    features: jnp.ndarray

    # Geometry (world space)
    v0: jnp.ndarray   # (Tw, 3)
    e1: jnp.ndarray   # (Tw, 3)
    e2: jnp.ndarray   # (Tw, 3)
    n0: jnp.ndarray   # (Tw, 3) world-space shading normals per corner
    n1: jnp.ndarray
    n2: jnp.ndarray
    uv0: jnp.ndarray  # (Tw, 2)
    uv1: jnp.ndarray
    uv2: jnp.ndarray

    # Materials (same contract as MeshTopology data0..data3, SURVEY.md §2.2)
    base_color: jnp.ndarray  # (Tw, 3)
    mat: jnp.ndarray         # (Tw,) i32
    mrir: jnp.ndarray        # (Tw, 3) metallic, roughness, ior
    tex: jnp.ndarray         # (Tw, 4) i32
    emissive: jnp.ndarray    # (Tw, 3)

    # Back-references into the flat-buffer contract
    tri_idx: jnp.ndarray   # (Tw,) i32 topology index
    inst_idx: jnp.ndarray  # (Tw,) i32 TLAS-sorted instance index

    # Lights: world-tri ids of emissive triangles, (L,) i32 (+count)
    light_wt: jnp.ndarray
    light_count: jnp.ndarray

    valid_count: jnp.ndarray  # () i32 — unpadded Tw

    # Combined shading row table (Tw, SHADE_K) for single-matmul fetches;
    # column layout in SHADE_COLS.
    shade_table: jnp.ndarray

    # Shade rows of the light triangles, (Lpad, SHADE_K): NEE fetches sample
    # this directly instead of a light_wt -> shade_table double indirection.
    light_rows: jnp.ndarray

    # --- Precomputed Pallas kernel operand tables (built once per scene
    # update; building them inside the jitted sweep costs ~1.5 ms of
    # small-op dispatch PER SWEEP on TPU — measured round 2) ---
    # featk3: (n_tiles, FEAT_K3, 5C) bf16 — per-tile transposed Plucker
    #   features pre-split into the bf16x3 hi/lo cross-term layout
    #   [fh | fh | fl | 0] over the FEAT_P meaningful rows.
    featk3: jnp.ndarray
    # spheres: (n_tiles, 1, 128) f32 — per-tile bounding spheres (cull).
    spheres: jnp.ndarray
    # shadek3: (n_tiles, SHADE_K, 3C) bf16 — shade rows split [hi|mid|lo]
    #   (exact: 3x8 mantissa bits cover f32) for the one-hot row fetch.
    shadek3: jnp.ndarray


def _round_up(n, m):
    return max(m, ((n + m - 1) // m) * m)


def tri_tile_width(twp: int) -> int:
    """Kernel triangle-tile width for a padded triangle count: single-tile
    scenes use their exact (8-aligned) size; larger scenes use 128."""
    c = twp if twp < 128 else 128
    assert twp % c == 0, (twp, c)
    return c


def _np_bf16():
    import ml_dtypes

    return ml_dtypes.bfloat16


def _np_split2(x):
    """f32 -> (hi, lo) bf16 pair (host-side mirror of pallas_dense._split2)."""
    bf16 = _np_bf16()
    hi = x.astype(bf16)
    lo = (x - hi.astype(np.float32)).astype(bf16)
    return hi, lo


def _np_split3(x):
    """f32 -> (hi, mid, lo) bf16 triple — exact (3x8 mantissa bits)."""
    bf16 = _np_bf16()
    hi = x.astype(bf16)
    r1 = x - hi.astype(np.float32)
    mid = r1.astype(bf16)
    lo = (r1 - mid.astype(np.float32)).astype(bf16)
    return hi, mid, lo


def _np_tile_spheres(v0, e1, e2, n_tiles):
    """Per-triangle-tile bounding spheres (n_tiles, 1, 128): [cx,cy,cz,r,0..].

    World triangles arrive in BLAS-leaf order (spatially coherent) so a
    tile's sphere is tight enough for culling; all-padding tiles get r = -1
    so the kernel skips them entirely."""
    tri_valid = (np.abs(v0).sum(1) + np.abs(e1).sum(1)
                 + np.abs(e2).sum(1)) > 0
    pts = np.stack([v0, v0 + e1, v0 + e2], axis=1)  # (Twp, 3, 3)
    big = np.float32(3e38)
    vmask = tri_valid[:, None, None]
    lo = np.where(vmask, pts, big).reshape(n_tiles, -1, 3).min(axis=1)
    hi = np.where(vmask, pts, -big).reshape(n_tiles, -1, 3).max(axis=1)
    empty = lo[:, 0] > hi[:, 0]
    center = np.where(empty[:, None], 0.0, (lo + hi) * 0.5)
    r = np.where(empty, -1.0, np.linalg.norm(
        np.where(empty[:, None], 0.0, hi - center), axis=1))
    out = np.concatenate([center, r[:, None]], axis=1).astype(np.float32)
    return np.pad(out, ((0, 0), (0, 124)))[:, None, :]


def _np_kernel_tables(features, shade, v0, e1, e2):
    """Precompute the Pallas sweep's scene-side operands (numpy, per scene
    update). Doing this host-side keeps ~1.5 ms of small-op dispatch out of
    every in-jit sweep call (9+ sweeps per frame).

    Layouts are DMA-tileable (the two-level kernel streams per-cluster
    blocks HBM->VMEM): featk3 keeps 5C on the 128-aligned minor dim (the
    kernel contracts over the leading 3K dim), shadek3 rows are padded to
    SHADE_KP (bf16 sublane multiple of 16)."""
    twp = v0.shape[0]
    c = tri_tile_width(twp)
    n_tiles = twp // c
    # Only 4 of the 5 column groups ride the matmul: td is recovered
    # in-kernel as s0 + s1 + s2 (Plucker identity — the edge cross products
    # sum to e1 x e2 = n and the edge deltas cancel), cutting the sweep's
    # dominant MXU term and the per-cluster DMA by 20%.
    feats = features.reshape(FEAT_K, 5, n_tiles, c)[:FEAT_P, :4].transpose(
        2, 0, 1, 3).reshape(n_tiles, FEAT_P, 4 * c)
    fh, fl = _np_split2(feats)
    zpad = np.zeros((n_tiles, FEAT_K3 - 3 * FEAT_P, 4 * c), fh.dtype)
    featk3 = np.concatenate([fh, fh, fl, zpad], axis=1)  # (n_tiles, K3, 4C)
    # pairs with rayk3 = [rh | rl | rh | 0] along K: fh@rh + fh@rl + fl@rh
    spheres = _np_tile_spheres(v0, e1, e2, n_tiles)  # (n_tiles, 1, 128)
    shadeT = shade.T.reshape(SHADE_K, n_tiles, c).transpose(1, 0, 2)
    shadeT = np.concatenate(
        [shadeT, np.zeros((n_tiles, SHADE_KP - SHADE_K, c), np.float32)],
        axis=1)
    sh, sm, sl = _np_split3(shadeT)
    shadek3 = np.concatenate([sh, sm, sl], axis=2)   # (n_tiles, SHADE_KP, 3C)
    return featk3, spheres, shadek3


def tri_pad(tw: int) -> int:
    """Padded world-triangle count: small scenes pad to a multiple of 8 (one
    sublane-sized kernel tile — a 36-tri cornell pays for 40 tris, not 128);
    larger scenes pad to full 128-wide tiles."""
    return _round_up(tw, 8) if tw <= 128 else _round_up(tw, 128)


def build_world_tris(world, pad_to: int | None = None, extra: dict | None = None):
    """Flatten all instances' triangles to world space (numpy, per update).

    `extra` (optional): name -> numpy array of small per-tick operands
    (the Renderer passes the camera block) to ride the SAME packed device
    transfer — each separate host->device put pays tunnel RPC latency on
    the animated path. Returns (WorldTris, {name: device array}) when
    given, else just the WorldTris."""
    topo = np.asarray(world.topology(), np.uint32).reshape(-1, 20)
    tri_v = topo[:, 0:3].astype(np.int64)
    tri_geom = topo[:, 3].astype(np.int64)
    attrs = topo[:, 4:20].copy().view(np.float32)
    pos = np.asarray(world.vertices(), np.float32).reshape(-1, 4)[:, :3]
    nrm = np.asarray(world.normals(), np.float32).reshape(-1, 4)[:, :3]
    uvs = np.asarray(world.uvs(), np.float32).reshape(-1, 2)

    inst = np.asarray(world.instances(), np.float32).reshape(-1, 36)
    n_inst = inst.shape[0]
    tf = inst[:, 0:16].reshape(n_inst, 4, 4).transpose(0, 2, 1)
    inv = inst[:, 16:32].reshape(n_inst, 4, 4).transpose(0, 2, 1)
    inst_geom = inst[:, 32:36].copy().view(np.uint32)[:, 2].astype(np.int64)

    lights = np.asarray(world.lights(), np.uint32).reshape(-1, 2).astype(np.int64)

    chunks = []
    light_wt = []
    base = 0
    for i in range(n_inst):
        sel = np.nonzero(tri_geom == inst_geom[i])[0]
        if sel.size == 0:
            continue
        rot = tf[i, :3, :3]
        trn = tf[i, :3, 3]
        # normals: inverse-transpose
        nrm_m = inv[i, :3, :3].T

        vi = tri_v[sel]
        v0 = pos[vi[:, 0]] @ rot.T + trn
        v1 = pos[vi[:, 1]] @ rot.T + trn
        v2 = pos[vi[:, 2]] @ rot.T + trn
        nn0 = pos_norm(nrm[vi[:, 0]] @ nrm_m.T)
        nn1 = pos_norm(nrm[vi[:, 1]] @ nrm_m.T)
        nn2 = pos_norm(nrm[vi[:, 2]] @ nrm_m.T)

        chunks.append((sel, v0, v1, v2, nn0, nn1, nn2,
                       uvs[vi[:, 0]], uvs[vi[:, 1]], uvs[vi[:, 2]]))

        # map this instance's light triangles to world-tri rows
        mine = lights[lights[:, 0] == i]
        if mine.size:
            # topology index -> position within sel
            lut = {int(t): k for k, t in enumerate(sel)}
            for _, t in mine:
                light_wt.append(base + lut[int(t)])
        base += sel.size

        chunks[-1] = chunks[-1] + (np.full(sel.size, i, np.int64),)

    if not chunks:
        # empty scene: one degenerate tri
        sel = np.zeros(1, np.int64)
        z3 = np.zeros((1, 3), np.float32)
        z2 = np.zeros((1, 2), np.float32)
        chunks = [(sel, z3, z3, z3, z3, z3, z3, z2, z2, z2,
                   np.zeros(1, np.int64))]

    sel_all = np.concatenate([c[0] for c in chunks])
    v0 = np.concatenate([c[1] for c in chunks])
    v1 = np.concatenate([c[2] for c in chunks])
    v2 = np.concatenate([c[3] for c in chunks])
    n0 = np.concatenate([c[4] for c in chunks])
    n1 = np.concatenate([c[5] for c in chunks])
    n2 = np.concatenate([c[6] for c in chunks])
    uv0 = np.concatenate([c[7] for c in chunks])
    uv1 = np.concatenate([c[8] for c in chunks])
    uv2 = np.concatenate([c[9] for c in chunks])
    wt_inst = np.concatenate([c[10] for c in chunks])

    tw = v0.shape[0]
    tw_pad = _round_up(tw, pad_to) if pad_to else tri_pad(tw)
    pad = tw_pad - tw

    def padf(a, fill=0.0):
        if pad == 0:
            return a
        shape = (pad,) + a.shape[1:]
        return np.concatenate([a, np.full(shape, fill, a.dtype)])

    v0, v1, v2 = padf(v0), padf(v1), padf(v2)
    n0, n1, n2 = padf(n0), padf(n1), padf(n2)
    uv0, uv1, uv2 = padf(uv0), padf(uv1), padf(uv2)
    sel_all = padf(sel_all)
    wt_inst = padf(wt_inst)

    a = attrs[np.clip(sel_all, 0, attrs.shape[0] - 1)]
    if pad:
        a[tw:] = 0.0

    e1 = v1 - v0
    e2 = v2 - v0

    # --- Plucker feature table ---
    # s_e for edge (a,b): d.(a x b) + m.(b-a)
    def edge_cols(pa, pb):
        c = np.zeros((FEAT_K, tw_pad), np.float32)
        c[0:3] = np.cross(pa, pb).T          # dotted with d
        c[3:6] = (pb - pa).T                 # dotted with m
        return c

    n = np.cross(e1, e2)
    col_s0 = edge_cols(v0, v1)
    col_s1 = edge_cols(v1, v2)
    col_s2 = edge_cols(v2, v0)
    col_tn = np.zeros((FEAT_K, tw_pad), np.float32)
    col_tn[6:9] = -n.T                        # -n.o
    col_tn[9] = np.einsum("tj,tj->t", n, v0)  # + n.v0
    col_td = np.zeros((FEAT_K, tw_pad), np.float32)
    col_td[0:3] = n.T                         # n.d

    features = np.concatenate([col_s0, col_s1, col_s2, col_tn, col_td], axis=1)

    lw = np.asarray(light_wt, np.int64) if light_wt else np.zeros(1, np.int64)

    mat_f = a[:, 3:4]
    shade = np.concatenate(
        [v0, e1, e2, n0, n1, n2, uv0, uv1, uv2,
         a[:, 0:3], mat_f, a[:, 4:7], a[:, 8:12], a[:, 12:15],
         sel_all[:, None].astype(np.float32), wt_inst[:, None].astype(np.float32)],
        axis=1,
    ).astype(np.float32)
    assert shade.shape[1] == SHADE_K

    # Pad the light-row table to a SUBLANE multiple only (8), not 128: the
    # per-bounce NEE fetch is a (SHADE_K, Lpad) @ (Lpad, R) one-hot matmul,
    # and typical scenes have 2-8 emissive triangles — padding to 128 made
    # that matmul 16x bigger than needed (measured ~8% of the cornell frame).
    lw_pad = _round_up(len(lw), 8)
    lw_padded = np.zeros(lw_pad, np.int64)
    lw_padded[: len(lw)] = lw
    light_rows = shade[np.clip(lw_padded, 0, shade.shape[0] - 1)]

    featk3, spheres, shadek3 = _np_kernel_tables(features, shade, v0, e1, e2)

    host = dict(
        features=features,
        v0=v0, e1=e1, e2=e2, n0=n0, n1=n1, n2=n2,
        uv0=uv0, uv1=uv1, uv2=uv2,
        base_color=np.ascontiguousarray(a[:, 0:3]),
        mat=(a[:, 3] + 0.5).astype(np.int32),
        mrir=np.ascontiguousarray(a[:, 4:7]),
        tex=np.ascontiguousarray(a[:, 8:12]).astype(np.int32),
        emissive=np.ascontiguousarray(a[:, 12:15]),
        tri_idx=sel_all.astype(np.int32),
        inst_idx=wt_inst.astype(np.int32),
        light_wt=lw.astype(np.int32),
        light_count=np.int32(len(light_wt)),
        valid_count=np.int32(tw),
        shade_table=shade,
        light_rows=light_rows,
        featk3=featk3,
        spheres=spheres,
        shadek3=shadek3,
    )
    if extra:
        host.update({f"x_{k}": np.asarray(v) for k, v in extra.items()})
    dev = _upload_tables(host)
    if extra:
        ex = {k[2:]: dev.pop(k) for k in list(dev) if k.startswith("x_")}
        return WorldTris(**dev), ex
    return WorldTris(**dev)


# Per-tick scene re-uploads below this total size ride TWO device transfers
# (one f32/i32 stream + one bf16 stream) unpacked by a jitted device-side
# slice program, instead of ~25 separate host->device puts: on a tunneled
# chip each put pays per-op latency, which dominated the animated-refit
# frame (bench config 4). Large scenes (load-once; the packing memcpy would
# cost more than it saves) keep per-array uploads.
_PACK_MAX_BYTES = 32 * 1024 * 1024


def _upload_tables(host: dict) -> dict:
    """numpy tables -> device arrays; packed two-transfer path when small."""
    total = sum(int(np.asarray(v).nbytes) for v in host.values())
    if total > _PACK_MAX_BYTES:
        out = {}
        for k, v in host.items():
            v = np.asarray(v)
            out[k] = jnp.asarray(v if v.dtype != np.int64 else
                                 v.astype(np.int32))
        return out

    bf16 = _np_bf16()
    spec32 = []   # (name, offset, size, shape, kind)
    spec16 = []
    parts32 = []
    parts16 = []
    off32 = off16 = 0
    for k in sorted(host):
        v = np.asarray(host[k])
        if v.dtype == bf16:
            spec16.append((k, off16, v.size, v.shape))
            parts16.append(v.reshape(-1))
            off16 += v.size
        else:
            kind = "i32" if v.dtype in (np.int32, np.int64) else "f32"
            flat = (v.astype(np.int32).view(np.float32) if kind == "i32"
                    else v.astype(np.float32)).reshape(-1)
            spec32.append((k, off32, v.size, v.shape, kind))
            parts32.append(flat)
            off32 += v.size
    buf32 = np.concatenate(parts32) if parts32 else np.zeros(1, np.float32)
    buf16 = np.concatenate(parts16) if parts16 else np.zeros(1, bf16)
    # One BATCHED device_put for both streams: separate puts each pay the
    # tunnel's per-RPC latency on the animated path.
    d32, d16 = jax.device_put((buf32, buf16))
    dev = _unpack_fn(tuple(spec32), tuple(spec16))(d32, d16)
    return dict(dev)


@functools.lru_cache(maxsize=16)
def _unpack_fn(spec32, spec16):
    """Compile one device-side unpack program per scene shape signature."""

    @jax.jit
    def unpack(buf32, buf16):
        out = {}
        for name, off, size, shape, kind in spec32:
            a = buf32[off:off + size]
            if kind == "i32":
                a = jax.lax.bitcast_convert_type(a, jnp.int32)
            out[name] = a.reshape(shape)
        for name, off, size, shape in spec16:
            out[name] = buf16[off:off + size].reshape(shape)
        return out

    return unpack


def pos_norm(v):
    l = np.linalg.norm(v, axis=-1, keepdims=True)
    return np.where(l > 0, v / np.maximum(l, 1e-20), v)


def ray_features(ro, rd):
    """Build the (R, FEAT_K) feature vectors [d, o x d, o, 1, pad]."""
    m = jnp.cross(ro, rd)
    ones = jnp.ones_like(ro[:, :1])
    pad = jnp.zeros((ro.shape[0], FEAT_K - 10), ro.dtype)
    return jnp.concatenate([rd, m, ro, ones, pad], axis=-1)
