"""Row fetches without per-lane gathers: one-hot matmul on the MXU.

TPU dynamic gathers run at O(100M elements/s) — three orders of magnitude
under the MXU. For the table sizes a renderer sees (<= ~16k rows), the
classic TPU trick of expressing gather as one_hot(idx) @ table turns every
shading-attribute fetch into dense matmul work. Chunked over rows so the
(R, N) one-hot is never fully materialized. Exact: one nonzero per row, so
the f32 matmul reproduces table values bit-exactly.

The KRONECKER variant (KronTable / pallas_fetch_kron) factors the one-hot
over a row split N = hi x 128: two narrow one-hots (hi + 128 compares per
lane instead of N), one (3K*128, hi) @ (hi, M) matmul against a
VMEM-resident bf16x3-plane table, and a 128-row weighted reduce. Per-lane
matmul work is 24*N MACs — for a 128^2 texture mip (N = 16384) that is an
MXU-floor ~4 ms at 2M lanes, vs ~8-11 ms for the XLA row gather the round-4
mip experiment measured (utils/textures.py:72-83). Exact: the bf16x3 plane
split reconstructs f32 bit-for-bit and every contraction has one nonzero.

Falls back to jnp.take on CPU (tests/interpret) where gathers are cheap.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

ROW_CHUNK = 1024
ONEHOT_MAX_ROWS = 16384

KRON_LO = 128            # minor split: one vreg-width of one-hot compares
KRON_MAX_ROWS = 65536    # t2 at this cap: (3K*128, 512) bf16 = 1.5 MB VMEM


def use_onehot(n_rows: int) -> bool:
    return jax.default_backend() == "tpu" and n_rows <= ONEHOT_MAX_ROWS


def gather_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table (N, K), idx (R,) int -> (R, K). Out-of-range idx are clipped."""
    n, k = table.shape
    idx = jnp.clip(idx, 0, n - 1)
    if not use_onehot(n):
        return table[idx]
    from .pallas_dense import pallas_fetch

    return pallas_fetch(table, idx)


class TexKron(NamedTuple):
    """A packed quad-table texture level servable by pallas_fetch_kron.

    flat: (K, S, S, 4) uint32 — the pack_quad_table layout (CPU fallback
      path AND the shape metadata: K/S are static through jit).
    t2:   (3*4*KRON_LO, hi) bf16 — the kron fetch operand: for word w and
      bf16x3 plane p, row (w*3+p)*KRON_LO + l, column h holds plane p of
      f32(flat_row[h*KRON_LO + l, w]) (u32 words < 2^24 are exact in f32).
    """

    flat: jnp.ndarray
    t2: jnp.ndarray


def build_tex_kron(quad: np.ndarray) -> TexKron:
    """pack_quad_table output (K, S, S, 4) u32 -> TexKron (numpy arrays)."""
    from ..render.worldtris import _np_split3
    k_img, s, _, words = quad.shape
    flat = quad.reshape(-1, words)
    n = flat.shape[0]
    assert n <= KRON_MAX_ROWS, (n, KRON_MAX_ROWS)
    lo = KRON_LO
    npad = (-n) % lo
    if npad:
        flat_p = np.concatenate([flat, np.zeros((npad, words), np.uint32)])
    else:
        flat_p = flat
    hi = flat_p.shape[0] // lo
    t3 = flat_p.astype(np.float32).reshape(hi, lo, words)
    planes = _np_split3(t3)                       # 3 x (hi, lo, words)
    blocks = []
    for w in range(words):
        for p in range(3):
            blocks.append(planes[p][:, :, w].T)   # (lo, hi)
    t2 = np.concatenate(blocks, axis=0)           # (3*words*lo, hi)
    return TexKron(flat=quad, t2=t2)


def kron_rows(kt: TexKron, rows: jnp.ndarray) -> jnp.ndarray:
    """rows (R,) i32 -> (R, 4) u32 quad words (exact)."""
    if jax.default_backend() != "tpu":
        return kt.flat.reshape(-1, kt.flat.shape[-1])[rows]
    from .pallas_dense import pallas_fetch_kron

    words = pallas_fetch_kron(kt.t2, rows, k_cols=kt.flat.shape[-1])
    return words.T.astype(jnp.uint32)
