"""Chained-timing microbench of pair-enumeration build primitives (TPU).

Methodology (two pitfalls found while building this):

1. **`jax.block_until_ready` does not reliably wait on the axon tunnel**
   (a warm 42-iteration chained-sort loop "completed" in 0.1 ms by its
   clock; forcing a host transfer showed 6.9 ms/sort). Every timing here
   forces a `float()` readback of a scalar carry.
2. **`static_argnums` on the iteration count recompiles per count**, so
   `t(n) - t(n//4)` silently times the COMPILE of the n-variant (sort
   comparators compile in 10-50 s). Both variants are warmed before
   timing.
3. XLA simplifies `sort(x)[0]` to a min-reduction — a carry that reads
   only the head of a sorted array DELETES the sort. Carries here sample
   a 1024-stride of the result.

Measured on TPU v5e (2026-08-19, tunneled chip; ±20% session drift):

  mask+key group-8 524k x 2009    ~26 ms   (dense interval tests + per-
                                            8-lane-group OR/min, both
                                            naive and group-interleaved
                                            layouts — VPU/fusion bound)
  sortkv i32 4.2M (key+payload)    ~6.9 ms
  gather 2M x 512B rows            ~7.0 ms  (sorted ids 6.7; bf16 5.0)
  gather-back 16M f32 elementwise  ~144 ms  <-- kills per-pair-lane
  gather-back 2M x 32B rows        ~28 ms   <-- re-binning in XLA
  topk64 over (65536, 2009)        (not cleanly measured; sort-class)

Conclusion recorded in tools/README.md: a full XLA-side pair pipeline
(mask -> top-k -> sort -> gather rays -> block kernel -> un-permute
combine) pays ~26 ms for the mask and ~28-144 ms for the combine
re-binning PER SWEEP — over the whole frame budget before any
intersection runs. The pair-exactness win must instead land INSIDE the
existing two-level-sweep kernel (per-128-lane-window epilogues), where
the combine is a windowed accumulator update and costs nothing.

Run: python tools/microbench_pairs2.py
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

R2 = 524288          # 2R lanes (fused sweep, spheres 512^2)
G8 = R2 // 8         # 65536 groups
CT = 2009
P = 2 * 1024 * 1024  # ~ realistic budgeted pair count


def timeit(name, run, k_lo=2, k_hi=10):
    """run(k) -> f32 scalar with a k-iteration chained loop inside jit."""
    fj = jax.jit(run, static_argnums=0)
    float(fj(k_lo))
    float(fj(k_hi))          # warm BOTH variants before timing
    t0 = time.perf_counter()
    float(fj(k_lo))          # float() forces a real device sync
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(fj(k_hi))
    t_hi = time.perf_counter() - t0
    print(f"{name:30s} {(t_hi - t_lo) / (k_hi - k_lo) * 1e3:9.2f} ms/iter",
          flush=True)


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)

    # --- dense interval mask + entry keys, group-8 interleaved layout
    o = jax.random.uniform(ks[0], (3, R2)) * 20 - 10
    d = jax.random.normal(ks[1], (3, R2))
    sph = jnp.concatenate([jax.random.uniform(ks[2], (CT, 3)) * 20 - 10,
                           jax.random.uniform(ks[3], (CT, 1)) * 2], axis=1)
    tclip = jax.random.uniform(ks[4], (R2,)) * 40

    def mask_interleaved(oo, dd_, tc):
        ddot = (dd_ * dd_).sum(0)
        dlen = jnp.sqrt(ddot)
        npad = (-CT) % 128
        sp = jnp.pad(sph, ((0, npad), (0, 0)), constant_values=-1.0)
        nch = sp.shape[0] // 128
        o3 = oo.reshape(3, 8, G8)
        d3 = dd_.reshape(3, 8, G8)
        tc2 = tc.reshape(8, G8)
        dd2 = ddot.reshape(8, G8)
        dl2 = dlen.reshape(8, G8)

        def body(c0, acc):
            ok_acc, key_acc = acc
            s = jax.lax.dynamic_slice(sp, (c0 * 128, 0), (128, 4))
            cx, cy, cz, r = (s[:, 0:1, None], s[:, 1:2, None],
                             s[:, 2:3, None], s[:, 3:4, None])
            ocx = o3[0][None] - cx
            ocy = o3[1][None] - cy
            ocz = o3[2][None] - cz
            b = d3[0][None] * ocx + d3[1][None] * ocy + d3[2][None] * ocz
            cc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
            disc = b * b - dd2[None] * cc
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            ok = (disc >= 0.0) & (-b - sq <= dd2[None] * tc2[None]) \
                & (-b + sq >= dd2[None] * 1e-3)
            entry = jnp.maximum((-b - sq) / dd2[None] * dl2[None], 0.0)
            kk = jnp.where(ok, entry, jnp.float32(3e38))
            ok_acc = jax.lax.dynamic_update_slice(
                ok_acc, ok.any(1), (c0 * 128, 0))
            key_acc = jax.lax.dynamic_update_slice(
                key_acc, kk.min(1), (c0 * 128, 0))
            return ok_acc, key_acc

        return jax.lax.fori_loop(
            0, nch, body,
            (jnp.zeros((nch * 128, G8), bool),
             jnp.full((nch * 128, G8), 3e38, jnp.float32)))

    def run_mask(k):
        def it(i, carry):
            m, kk = mask_interleaved(o, d, tclip + 0.0 * i)
            return carry + m[::64, ::1024].sum(dtype=jnp.int32).astype(
                jnp.float32) + kk[::64, ::1024].sum() * 1e-9
        return jax.lax.fori_loop(0, k, it, jnp.float32(0))

    timeit("mask+key_g8_524kx2009", run_mask, 2, 6)

    # --- key/payload sort at pair scale
    keys_p = jax.random.randint(ks[5], (2 * P,), 0, CT, dtype=jnp.int32)
    pay = jnp.arange(2 * P, dtype=jnp.int32)

    def run_sort(k):
        def it(i, carry):
            sk, sp_ = jax.lax.sort((keys_p + i, pay), num_keys=1)
            return carry + (sk[::1024].sum(dtype=jnp.int32)
                            + sp_[::1024].sum(dtype=jnp.int32)
                            ).astype(jnp.float32) * 1e-9
        return jax.lax.fori_loop(0, k, it, jnp.float32(0))

    timeit("sortkv_i32_4.2M", run_sort, 2, 6)

    # --- ray-row gather at pair scale (512 B group rows)
    src = jax.random.normal(ks[6], (G8, 128))
    gidx = jax.random.randint(ks[7], (P,), 0, G8, dtype=jnp.int32)

    def run_gather(k):
        def it(i, carry):
            g = jnp.take(src, (gidx + i) % G8, axis=0)
            return carry + g[::4096, ::64].sum()
        return jax.lax.fori_loop(0, k, it, jnp.float32(0))

    timeit("gather_2M_rows512B", run_gather, 2, 10)

    # --- combine re-binning: per-pair-lane results back to lane order
    vals = jax.random.uniform(ks[2], (P * 8,))
    perm = jax.random.permutation(ks[4], P * 8)

    def run_gb(k):
        def it(i, carry):
            g = jnp.take(vals, (perm + i) % (P * 8))
            return carry + g[::4096].sum()
        return jax.lax.fori_loop(0, k, it, jnp.float32(0))

    timeit("gatherback_16M_f32", run_gb, 2, 6)

    vals2 = vals.reshape(-1, 8)
    perm2 = jax.random.permutation(ks[5], vals2.shape[0])

    def run_gb_rows(k):
        def it(i, carry):
            g = jnp.take(vals2, (perm2 + i) % vals2.shape[0], axis=0)
            return carry + g[::4096, ::4].sum()
        return jax.lax.fori_loop(0, k, it, jnp.float32(0))

    timeit("gatherback_2Mrows32B", run_gb_rows, 2, 6)


if __name__ == "__main__":
    main()
