"""Where do spheres' 929 ms/frame go? Component timing of the two-level
sweep (_run2) at 512^2 on the spheres preset, marginal chained timing.

Stages: (1) coherence sort (key+argsort+row gather), (2) cluster worklist,
(3) the Pallas kernel itself (pre-sorted inputs), (4) the un-permute row
gather, (5) full sweep, (6) full frame. Plus survivor-count stats.

Run: python tools/profile_spheres.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import build  # noqa: E402
import webgpu_raytracer_tpu.ops.pallas_dense as pd  # noqa: E402
from webgpu_raytracer_tpu.ops.cluster_cull import tile_cluster_worklist  # noqa: E402
from webgpu_raytracer_tpu.ops.dense_trace import trace_pixels_dense  # noqa: E402
from webgpu_raytracer_tpu.render.worldtris import FEAT_K  # noqa: E402


def chain(f):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(*args, n):
        def body(i, acc):
            return acc + f(*args, i)
        return jax.lax.fori_loop(0, n, body, jnp.zeros(()))
    return run


def marginal(run, *args, n=16, n2=4):
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
    world, wt, scene, camera = build("spheres")
    R = 512 * 512
    key = jax.random.PRNGKey(0)
    # random bounce-like rays from within the scene
    ro = tuple(jax.random.uniform(jax.random.PRNGKey(i), (R,)) * 10 - 5
               for i in range(3))
    rd = tuple(jax.random.normal(jax.random.PRNGKey(3 + i), (R,))
               for i in range(3))
    t_max = jnp.full((R,), pd.T_MAX, jnp.float32)
    n_cl = wt.featk3.shape[0]
    print(f"clusters={n_cl} tiles={R // pd.M_TILE2}", flush=True)

    # (1) coherence sort cost: key + argsort + (R,8) row gather
    def sort_stage(ro, rd, i):
        rox = ro[0] + i * 1e-12
        key = (rox * 8).astype(jnp.int32) & 7
        for c in (ro[1], ro[2]):
            key = key * 8 + ((c * 8).astype(jnp.int32) & 7)
        perm = jnp.argsort(key)
        comps = jnp.stack([rox, ro[1], ro[2], rd[0], rd[1], rd[2],
                           rox, rox], axis=1)
        return comps[perm, :].T.sum()
    dt = marginal(chain(sort_stage), ro, rd)
    print(f"sort+gather(R,8):    {dt*1e3:8.2f} ms", flush=True)

    # (1b) un-permute-shaped gather: (R, 50) rows
    big = jnp.zeros((R, 50), jnp.float32)
    def unperm_stage(big, ro, i):
        perm = jnp.argsort(ro[0] + i * 1e-12)
        return big[perm, :].T.sum()
    dt = marginal(chain(unperm_stage), big, ro)
    print(f"unpermute(R,50):     {dt*1e3:8.2f} ms", flush=True)

    # (2) worklist
    def wl_stage(ro, rd, t_max, wt, i):
        rayfT = pd.rayf_from_components(ro[0] + i * 1e-12, ro[1], ro[2],
                                        rd[0], rd[1], rd[2])
        order, keys, counts = tile_cluster_worklist(
            rayfT, t_max, wt.spheres[:, 0, :], pd.M_TILE2)
        return counts.sum().astype(jnp.float32) + keys[0, 0]
    dt = marginal(chain(wl_stage), ro, rd, t_max, wt)
    print(f"worklist:            {dt*1e3:8.2f} ms", flush=True)

    # (5) full sweep with rows
    def sweep(ro, rd, wt, i):
        ro = (ro[0] + i * 1e-12, ro[1], ro[2])
        t, idx, rows = pd.pallas_closest_with_row(
            wt, ro, rd, active=jnp.ones(R, bool))
        return t.sum() + rows[0].sum()
    dt5 = marginal(chain(sweep), ro, rd, wt)
    print(f"full sweep w/rows:   {dt5*1e3:8.2f} ms (random rays)", flush=True)

    # (5b) full sweep without rows (shadow-type)
    def sweep_nr(ro, rd, wt, i):
        ro = (ro[0] + i * 1e-12, ro[1], ro[2])
        occ = pd.pallas_shadow(wt, ro, rd, t_max=jnp.full((R,), 1e3),
                               active=jnp.ones(R, bool))
        return occ.sum().astype(jnp.float32)
    dt = marginal(chain(sweep_nr), ro, rd, wt)
    print(f"full sweep shadow:   {dt*1e3:8.2f} ms (random rays)", flush=True)

    # (6) full frame (camera rays; the bench number)
    cam = jnp.asarray(world.camera())
    def frame(wt, tex, cam, i):
        col, rays = trace_pixels_dense(
            wt, tex, cam, i + 1, jnp.zeros(2, jnp.float32),
            512, 512, 1, 8, with_stats=True)
        return col.mean() + rays * 0.0
    dt = marginal(chain(frame), wt, scene.textures, cam, n=4, n2=1)
    print(f"full frame:          {dt*1e3:8.2f} ms", flush=True)

    # survivor stats for primary vs bounce-like vs random rays
    from webgpu_raytracer_tpu.ops.dense_trace import intersect_and_shade
    from webgpu_raytracer_tpu.ops.v3 import V3, dot, where

    def bounce_rays():
        """Real-ish bounce-1 rays: primary hits reflected about the normal
        with a small perturbation (origin clustering of true bounce rays)."""
        o, d = prim_rays()
        hit = intersect_and_shade(wt, jnp.ones((1, 1, 1, 3)), V3(*o), V3(*d),
                                  jnp.ones(R, bool))
        hp = V3(*o) + V3(*d) * hit.hit_t
        n = hit.geom_n
        dv = V3(*d)
        refl = dv - n * (2.0 * dot(dv, n))
        live = hit.wt >= 0
        return ((hp.x, hp.y, hp.z), (refl.x, refl.y, refl.z),
                jnp.where(live, pd.T_MAX, 0.0))

    def prim_rays():
        c = camera
        lane = jnp.arange(R, dtype=jnp.uint32)
        px = (lane % 512).astype(jnp.float32)
        py = (lane // 512).astype(jnp.float32)
        u = (px + 0.5) / 512
        v = 1.0 - (py + 0.5) / 512
        o = tuple(jnp.broadcast_to(c[i], (R,)) for i in range(3))
        d = (c[4] + u * c[8] + v * c[12] - c[0],
             c[5] + u * c[9] + v * c[13] - c[1],
             c[6] + u * c[10] + v * c[14] - c[2])
        return o, d

    for name in ("primary", "bounce1", "random"):
        tm = t_max
        if name == "primary":
            o, d = prim_rays()
        elif name == "bounce1":
            o, d, tm = bounce_rays()
        else:
            o, d = ro, rd
        # coherence-sort lanes exactly like _run2 before computing stats
        sph_flat = wt.spheres[:, 0, :]
        live_c = sph_flat[:, 3] >= 0.0
        smin = jnp.min(jnp.where(live_c[:, None], sph_flat[:, 0:3]
                                 - sph_flat[:, 3:4], 3e38), axis=0)
        sext = jnp.maximum(jnp.max(
            jnp.where(live_c[:, None], sph_flat[:, 0:3] + sph_flat[:, 3:4],
                      -3e38), axis=0) - smin, 1e-20)
        keyv = jnp.zeros((R,), jnp.int32)
        octant = jnp.zeros((R,), jnp.int32)
        for a in range(3):
            q = jnp.clip(((o[a] - smin[a]) / sext[a] * 8.0)
                         .astype(jnp.int32), 0, 7)
            keyv = keyv * 8 + q
            octant = octant * 2 + (d[a] < 0.0).astype(jnp.int32)
        keyv = jnp.where(tm > 0.0, octant * 512 + keyv, 1 << 13)
        perm = jnp.argsort(keyv)
        o = tuple(c[perm] for c in o)
        d = tuple(c[perm] for c in d)
        tm_s = tm[perm] if tm.ndim else tm
        rayfT = pd.rayf_from_components(*o, *d)
        _, keys, counts = tile_cluster_worklist(
            rayfT, jnp.broadcast_to(tm_s, (R,)), sph_flat, pd.M_TILE2)
        counts = np.asarray(counts)
        print(f"survivors/{name}: mean={counts.mean():.0f} "
              f"p50={np.percentile(counts, 50):.0f} "
              f"max={counts.max()}", flush=True)


if __name__ == "__main__":
    main()
