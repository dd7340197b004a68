"""Component timing at 512^2 vs 1080p via MARGINAL chained timing
(time(chain(32)) - time(chain(8)), /24): cancels dispatch + tunnel RT.

Run: python tools/profile_1080p.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import build  # noqa: E402
from webgpu_raytracer_tpu.ops.dense_trace import trace_pixels_dense  # noqa: E402
from webgpu_raytracer_tpu.ops.pallas_dense import pallas_closest_with_row  # noqa: E402


def chain(f):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(*args, n):
        def body(i, acc):
            return acc + f(*args, i)
        return jax.lax.fori_loop(0, n, body, jnp.zeros(()))
    return run


def marginal(run, *args, n=32, n2=8):
    np.asarray(run(*args, n=n))
    np.asarray(run(*args, n=n2))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(*args, n=n2))
        t2 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(run(*args, n=n))
        tn = time.perf_counter() - t0
        best = min(best, max(tn - t2, 1e-9))
    return best / (n - n2)


def main():
    world, wt, scene, camera = build("cornell")
    for (w, h) in ((512, 512), (1920, 1080)):
        world.update_camera(w, h)
        cam = jnp.asarray(world.camera())
        R = w * h
        key = jax.random.PRNGKey(0)
        ro = tuple(jax.random.uniform(key, (R,)) * 0.1 for _ in range(3))
        rd = tuple(jax.random.normal(jax.random.PRNGKey(i), (R,))
                   for i in range(3))

        def sweep(ro, rd, wt, i):
            ro = (ro[0] + i * 1e-12, ro[1], ro[2])
            t, idx, rows = pallas_closest_with_row(
                wt, ro, rd, active=jnp.ones(ro[0].shape[0], bool))
            return t.sum() + rows[0].sum()
        dt_a = marginal(chain(sweep), ro, rd, wt)

        ro2 = tuple(jnp.concatenate([x, x]) for x in ro)
        rd2 = tuple(jnp.concatenate([x, x]) for x in rd)

        def sweep2(ro, rd, wt, i):
            ro = (ro[0] + i * 1e-12, ro[1], ro[2])
            t, idx, rows = pallas_closest_with_row(
                wt, ro, rd, active=jnp.ones(2 * R, bool), row_from_lane=R)
            return t.sum() + rows[0].sum()
        dt_b = marginal(chain(sweep2), ro2, rd2, wt)

        def frame(wt, tex, cam, i):
            col, rays = trace_pixels_dense(
                wt, tex, cam, i + 1, jnp.zeros(2, jnp.float32),
                w, h, 1, 8, with_stats=True)
            return col.mean() + rays * 0.0
        dt_c = marginal(chain(frame), wt, scene.textures, cam, n=16, n2=4)

        print(f"{w}x{h} (R={R>>10}k): primary_sweep={dt_a*1e3:7.2f} ms "
              f"({dt_a/R*1e9:5.2f} ns/lane)  fused2R={dt_b*1e3:7.2f} ms "
              f"({dt_b/(2*R)*1e9:5.2f} ns/lane)  frame={dt_c*1e3:7.2f} ms "
              f"({dt_c/R*1e9:6.2f} ns/lane)", flush=True)


if __name__ == "__main__":
    main()
