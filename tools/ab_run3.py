"""Isolate the job-stream sweep's pieces on the real TPU (spheres bounce pop).

Times, interleaved:
  scan      — _run2 full sweep (production reference)
  jobs      — _run3 full sweep (g=m_tile3)
  cull128   — ONLY the _run3 XLA prefix (sort + exact cull at g)
  cull1024  — ONLY the _run2 XLA prefix (sort + exact cull at 1024)

Run: python tools/ab_run3.py [g]
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
from tools.debug_spheres import bounce_population  # noqa: E402


def main():
    g = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    tunnel_rt()
    world, wt, scene, camera = build("spheres")
    R = 512 * 512
    o, d, tm = bounce_population(wt, camera)
    act = jnp.ones(R, bool)
    sph_flat = wt.spheres[:, 0, :]

    tune_jobs = TuneConfig(narrow="jobs", m_tile3=g)

    def cull_at(m_tile):
        def f(o, d, tm):
            comps_s, rayfT, rayk3, inv_perm, rp, smin, sext = \
                pd._coherence_sort(o, d, tm, act, m_tile, 0, sph_flat,
                                   tune_jobs)
            order, keys, counts = tile_cluster_worklist_exact(
                rayfT, comps_s[6], sph_flat, m_tile)
            return counts.sum() + order[0, 0] + inv_perm[0]
        return f

    fns = {
        "scan": jax.jit(lambda o, d, tm: pd._run2(
            wt, o, d, tm, act, 1e-3, False, True)[0].sum()),
        "jobs": jax.jit(lambda o, d, tm: pd._run3(
            wt, o, d, tm, act, 1e-3, False, True, tune=tune_jobs)[0].sum()),
        f"cull{g}": jax.jit(cull_at(g)),
        "cull1024": jax.jit(cull_at(1024)),
    }
    for name, f in fns.items():
        np.asarray(f(o, d, tm))
        print(f"compiled {name}", flush=True)

    for rnd in range(4):
        line = []
        for name, f in fns.items():
            t0 = time.perf_counter()
            for _ in range(5):
                out = f(o, d, tm)
            np.asarray(out)
            line.append(f"{name}: {(time.perf_counter() - t0) / 5 * 1e3:7.2f} ms")
        print(f"round {rnd}: " + "   ".join(line), flush=True)


if __name__ == "__main__":
    main()
