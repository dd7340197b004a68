"""Microbenchmark: TPU gather cost vs index count, table size, row width.

Informs the texture-fetch and two-level sort/unsort optimization work:
if gather cost is ~constant per INDEX (row), the fix is fewer gather rows,
not narrower ones.

Run: python tools/microbench_gather.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def timeit(fn, *args):
    fn(*args).block_until_ready()
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        fn(*args).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    key = jax.random.PRNGKey(0)
    for n_rows in (1 << 20, 1 << 24):
        for width in (1, 4, 8, 48):
            table = jnp.zeros((n_rows, width), jnp.float32) + 1.0
            for r in (1 << 18, 1 << 21):
                idx = jax.random.randint(key, (r,), 0, n_rows)

                f = jax.jit(lambda t, i: t[i].sum())
                dt = timeit(f, table, idx)
                print(f"table ({n_rows>>20}M, {width:2d}) f32, idx {r>>10:5d}k: "
                      f"{dt*1e3:8.3f} ms  {dt/r*1e9:6.1f} ns/row", flush=True)

    # sorted (coherent) indices vs random
    n_rows, width, r = 1 << 24, 4, 1 << 21
    table = jnp.zeros((n_rows, width), jnp.float32) + 1.0
    idx = jnp.sort(jax.random.randint(key, (r,), 0, n_rows))
    f = jax.jit(lambda t, i: t[i].sum())
    dt = timeit(f, table, idx)
    print(f"SORTED idx, table (16M, 4), idx 2M: {dt*1e3:8.3f} ms "
          f"{dt/r*1e9:6.1f} ns/row", flush=True)

    # argsort cost at 512k / 2M
    for r in (1 << 19, 1 << 21):
        k = jax.random.randint(key, (r,), 0, 1 << 13)
        f = jax.jit(lambda x: jnp.argsort(x))
        dt = timeit(f, k)
        print(f"argsort {r>>10}k i32: {dt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
