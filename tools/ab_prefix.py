"""Prefix (sort + cull) attribution + worklist stats, both ray populations.

Times on the real TPU, interleaved, at g=128:
  sortP/sortB   — _coherence_sort alone (primary-DoF / bounce pop)
  cullP/cullB   — sort + exact cull
  swpP/swpB     — full _run3 sweep (with rows)
Prints per-group worklist count stats for both populations.

Run: python tools/ab_prefix.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import build, tunnel_rt  # noqa: E402
import webgpu_raytracer_tpu.ops.pallas_dense as pd  # noqa: E402
from webgpu_raytracer_tpu.ops.cluster_cull import tile_cluster_worklist_exact  # noqa: E402
from webgpu_raytracer_tpu.ops.tune import TuneConfig  # noqa: E402
from tools.ab_primary2 import dof_rays  # noqa: E402
from tools.debug_spheres import bounce_population  # noqa: E402


def main():
    tunnel_rt()
    world, wt, scene, camera = build("spheres")
    R = 512 * 512
    act = jnp.ones(R, bool)
    sph_flat = wt.spheres[:, 0, :]
    tune = TuneConfig(narrow="jobs")
    g = tune.m_tile3

    do, ddir = jax.jit(dof_rays)(camera)
    do = tuple(jnp.asarray(np.asarray(c)) for c in do)
    ddir = tuple(jnp.asarray(np.asarray(c)) for c in ddir)
    bo, bd, btm = bounce_population(wt, camera)

    def sort_only(o, d, tm):
        comps_s, rayfT, rayk3, inv_perm, rp, smin, sext = \
            pd._coherence_sort(o, d, tm, act, g, 0, sph_flat, tune)
        return comps_s[0].sum() + rayk3[0].astype(jnp.float32).sum() \
            + inv_perm[0]

    def sort_cull(o, d, tm):
        comps_s, rayfT, rayk3, inv_perm, rp, smin, sext = \
            pd._coherence_sort(o, d, tm, act, g, 0, sph_flat, tune)
        order, keys, counts = tile_cluster_worklist_exact(
            rayfT, comps_s[6], sph_flat, g)
        return counts.sum() + order[0, 0] + inv_perm[0]

    def sweep(o, d, tm):
        return pd._run3(wt, o, d, tm, act, 1e-3, False, True,
                        tune=tune)[0].sum()

    def counts_of(o, d, tm):
        comps_s, rayfT, rayk3, inv_perm, rp, smin, sext = \
            pd._coherence_sort(o, d, tm, act, g, 0, sph_flat, tune)
        _, _, counts = tile_cluster_worklist_exact(
            rayfT, comps_s[6], sph_flat, g)
        return counts

    one = jnp.full(R, 1e30, jnp.float32)
    for name, (o, d, tm) in (("primary", (do, ddir, one)),
                             ("bounce", (bo, bd, btm))):
        c = np.asarray(jax.jit(counts_of)(o, d, tm))
        print(f"{name}: union mean {c.mean():.1f} p90 "
              f"{np.percentile(c, 90):.0f} max {c.max()} "
              f"jobs {c.sum()}", flush=True)

    fns = {
        "sortP": (jax.jit(sort_only), (do, ddir, one)),
        "cullP": (jax.jit(sort_cull), (do, ddir, one)),
        "swpP": (jax.jit(sweep), (do, ddir, one)),
        "sortB": (jax.jit(sort_only), (bo, bd, btm)),
        "cullB": (jax.jit(sort_cull), (bo, bd, btm)),
        "swpB": (jax.jit(sweep), (bo, bd, btm)),
    }
    for name, (f, a) in fns.items():
        np.asarray(f(*a))
        print(f"warm {name}", flush=True)
    for rnd in range(4):
        line = []
        for name, (f, a) in fns.items():
            t0 = time.perf_counter()
            for _ in range(5):
                out = f(*a)
            np.asarray(out)
            line.append(f"{name}: {(time.perf_counter() - t0) / 5 * 1e3:6.2f}")
        print(f"round {rnd}: " + "  ".join(line) + "  (ms)", flush=True)


if __name__ == "__main__":
    main()
