"""Row fetches without per-lane gathers: one-hot matmul on the MXU.

TPU dynamic gathers run at O(100M elements/s) — three orders of magnitude
under the MXU. For the table sizes a renderer sees (<= ~16k rows), the
classic TPU trick of expressing gather as one_hot(idx) @ table turns every
shading-attribute fetch into dense matmul work. Chunked over rows so the
(R, N) one-hot is never fully materialized. Exact: one nonzero per row, so
the f32 matmul reproduces table values bit-exactly.

Falls back to jnp.take on CPU (tests/interpret) where gathers are cheap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ROW_CHUNK = 1024
ONEHOT_MAX_ROWS = 16384


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
