"""Microbench XLA primitives for the pair-enumeration build phase (TPU).

Candidates for turning the (groups x clusters) survivor mask into a
cluster-sorted pair list and for combining per-pair results per ray:

  argsort_8m    argsort of P pair keys (cluster-major order)
  sort_pairs    lax.sort of (key, payload) at P
  scatter_min   .at[idx].min of P values into R slots
  seg_ids_gather re-gather of (P, 2) rows by a known permutation
  cumsum_66m    exclusive prefix over the flat mask (pair positions)
  topk_chunk    lax.top_k(k=64) over a (32k, 2009) chunk (per-ray lists)
  searchsorted  10M pair slots -> cluster id via offsets

Run: python tools/microbench_pairs.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def timeit(name, fn, *args, n=5):
    fn_j = jax.jit(fn)
    out = jax.block_until_ready(fn_j(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn_j(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:26s} {min(ts)*1e3:9.2f} ms", flush=True)
    return out


def main():
    key = jax.random.PRNGKey(0)
    P = 8 * 1024 * 1024
    R = 262144
    G8 = R // 8
    CT = 2009

    keys_p = jax.random.randint(key, (P,), 0, CT, dtype=jnp.int32)
    vals_p = jax.random.uniform(key, (P,))
    ridx_p = jax.random.randint(key, (P,), 0, R, dtype=jnp.int32)
    perm_p = jax.random.permutation(key, P)
    mask = (jax.random.uniform(key, (CT, G8)) < 0.03)

    timeit("argsort_8m", lambda k: jnp.argsort(k), keys_p)
    timeit("sort_pairs_8m", lambda k, v: jax.lax.sort((k, v), num_keys=1),
           keys_p, vals_p)
    timeit("scatter_min_8m_to_262k",
           lambda v, i: jnp.full((R,), 1e30).at[i].min(v), vals_p, ridx_p)
    timeit("gather_8m_rows2",
           lambda v, p: jnp.stack([v, v], 1)[p], vals_p, perm_p)
    timeit("cumsum_66m_i32",
           lambda m: jnp.cumsum(m.reshape(-1).astype(jnp.int32)), mask)
    timeit("cumsum_cols_66m",
           lambda m: jnp.cumsum(m.astype(jnp.int32), axis=1), mask)
    chunk = jax.random.uniform(key, (32768, CT))
    timeit("topk64_32k_x_2009", lambda c: jax.lax.top_k(c, 64), chunk)
    offs = jnp.sort(jax.random.randint(key, (CT,), 0, P, dtype=jnp.int32))
    slots = jnp.arange(10 * 1024 * 1024, dtype=jnp.int32) % P
    timeit("searchsorted_10m_2009",
           lambda o, s: jnp.searchsorted(o, s), offs, slots)
    # mask -> flat pair list via scatter of positions
    def build_scatter(m):
        flat = m.reshape(-1)
        pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
        pb = P
        tgt = jnp.where(flat, pos, pb)
        gid = jnp.arange(flat.shape[0], dtype=jnp.int32) % G8
        return jnp.zeros((pb,), jnp.int32).at[tgt].set(gid, mode="drop")
    timeit("mask_to_pairs_scatter", build_scatter, mask)


if __name__ == "__main__":
    main()
