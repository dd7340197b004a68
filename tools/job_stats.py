"""Sizing study for the job-stream narrow phase (spheres, real TPU pop).

The round-4/5 seeded A/B showed per-lane t-caps cannot shrink a 1024-lane
tile's cluster union enough to pay for a second phase — the union is a
TILE-granularity artifact. This tool measures what finer ray-group
granularity buys: on a REAL bounce-1 population (same generator as
tools/debug_spheres.py), after the SAME coherence sort _run2 applies,
it reports exact static-interval cluster-union sizes per ray group for
group sizes {1024, 256, 128, 64, 1} under three interval caps:

  static — [t_min, scene-slab exit]          (what the kernel culls today)
  oracle — [t_min, true closest-hit t]       (perfect per-lane seeding)
  bigcap — [t_min, min hit over the B biggest clusters]  (cheap prepass:
           sweep every lane against only the few largest clusters first)

Output per (granularity, cap): mean/p90/p99/max union, total jobs
(= sum of group unions), total lane-pairs (= jobs x group), vs the
current kernel's (tile=1024, static) baseline.

Run: python tools/job_stats.py   (needs the TPU for the true-t pass)
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import build, tunnel_rt  # noqa: E402
import webgpu_raytracer_tpu.ops.pallas_dense as pd  # noqa: E402
from webgpu_raytracer_tpu.ops.tune import DEFAULT_TUNE  # noqa: E402
from tools.debug_spheres import bounce_population  # noqa: E402


def coherence_perm(o, d, t_max, tune):
    """Replicates _run2's coherence-sort key (single segment, no rows)."""
    rox, roy, roz = o
    rdx, rdy, rdz = d
    rp = rox.shape[0]
    lane_live = t_max > 0.0
    key = jnp.zeros((rp,), jnp.int32)
    octant = jnp.zeros((rp,), jnp.int32)
    for a, (o_c, d_c) in enumerate(((rox, rdx), (roy, rdy), (roz, rdz))):
        o_lo = jnp.min(jnp.where(lane_live, o_c, jnp.float32(3e38)))
        o_ext = jnp.maximum(
            jnp.max(jnp.where(lane_live, o_c, jnp.float32(-3e38))) - o_lo,
            1e-20)
        cl = 1 << tune.cell_bits
        q = jnp.clip(((o_c - o_lo) / o_ext * cl).astype(jnp.int32), 0, cl - 1)
        key = key * cl + q
        dl_all = jnp.sqrt(rdx * rdx + rdy * rdy + rdz * rdz)
        dn = d_c / jnp.maximum(dl_all, 1e-20)
        lv = 1 << tune.dir_bits
        qd = jnp.clip(((dn + 1.0) * (0.5 * lv)).astype(jnp.int32), 0, lv - 1)
        octant = octant * lv + qd
    cell_span = 1 << (3 * tune.cell_bits)
    dir_span = 1 << (3 * tune.dir_bits)
    key = octant * cell_span + key
    key = jnp.where(lane_live, key, jnp.int32(cell_span * dir_span))
    return jnp.argsort(key)


CACHE = "/tmp/job_stats_pop.npz"


def load_population():
    """Bounce-1 population + true t, cached to disk after one TPU pass."""
    import os
    if os.path.exists(CACHE):
        z = np.load(CACHE)
        return ((z["ox"], z["oy"], z["oz"]), (z["dx"], z["dy"], z["dz"]),
                z["tm"], z["t_true"], z["idx"])
    tunnel_rt()
    world, wt, scene, camera = build("spheres")
    o, d, tm = bounce_population(wt, camera)
    R = o[0].shape[0]
    act = jnp.ones(R, bool)
    t0 = time.time()
    out_t, out_i = jax.jit(lambda o, d, tm: pd._run2(
        wt, o, d, tm, act, 1e-3, False, False))(o, d, tm)
    t_true = np.asarray(out_t)
    idx = np.asarray(out_i)
    print(f"true-t pass {time.time() - t0:.1f}s; "
        f"hit rate {(idx >= 0).mean():.3f}", flush=True)
    sph = np.asarray(wt.spheres[:, 0, :4])
    np.savez(CACHE, ox=np.asarray(o[0]), oy=np.asarray(o[1]),
             oz=np.asarray(o[2]), dx=np.asarray(d[0]), dy=np.asarray(d[1]),
             dz=np.asarray(d[2]), tm=np.asarray(tm), t_true=t_true, idx=idx,
             spheres=sph)
    return o, d, np.asarray(tm), t_true, idx


def main():
    tunnel_rt()
    world, wt, scene, camera = build("spheres")
    o, d, tm = bounce_population(wt, camera)
    R = o[0].shape[0]
    act = jnp.ones(R, bool)

    # True closest t on the TPU (the production kernel).
    t0 = time.time()
    out_t, out_i = jax.jit(lambda o, d, tm: pd._run2(
        wt, o, d, tm, act, 1e-3, False, False))(o, d, tm)
    t_true = np.asarray(out_t)
    idx = np.asarray(out_i)
    print(f"true-t pass {time.time() - t0:.1f}s; "
          f"hit rate {(idx >= 0).mean():.3f}", flush=True)

    perm = np.asarray(coherence_perm(o, d, tm, DEFAULT_TUNE))
    on = np.stack([np.asarray(c)[perm] for c in o])      # (3, R)
    dn = np.stack([np.asarray(c)[perm] for c in d])
    tmn = np.asarray(tm)[perm]
    t_true = t_true[perm]
    hit = idx[perm] >= 0

    sph = np.asarray(wt.spheres[:, 0, :4])               # (Ct, 128)->(Ct,4)
    live_c = sph[:, 3] >= 0
    c_xyz = sph[live_c, 0:3]
    c_r = sph[live_c, 3]
    ct = c_r.shape[0]
    print(f"clusters {ct}; R {R}", flush=True)

    # Scene slab exit (same as _run2 wcap, in ray-parameter units).
    s_lo = (c_xyz - c_r[:, None]).min(axis=0)
    s_hi = (c_xyz + c_r[:, None]).max(axis=0)
    d_safe = np.where(np.abs(dn) > 1e-20, dn,
                      np.where(dn >= 0, 1e-20, -1e-20))
    t1 = (s_lo[:, None] - on) / d_safe
    t2 = (s_hi[:, None] - on) / d_safe
    t_exit = np.maximum(t1, t2).min(axis=0)
    t_static = np.minimum(tmn, np.maximum(t_exit, 0.0))
    t_static = np.where(tmn > 0, t_static, 0.0)

    t_oracle = np.minimum(t_static, np.where(hit, t_true, np.inf))

    # Big-cluster prepass cap: closest hit among the B largest clusters is
    # an upper bound IF the prepass actually intersects their triangles.
    # Here we approximate its BEST CASE: cap = t_true where the winning
    # cluster is one of the B largest, else static. (A real prepass can
    # only do better than static, worse than oracle.)
    B = 32
    big = np.argsort(-c_r)[:B]
    tri2cluster = np.full(idx.max() + 2, -1, np.int64)
    # winner idx is a global triangle index; cluster = idx // 128
    win_cluster = np.where(hit, idx[perm] // 128, -1)
    is_big = np.isin(win_cluster, big)
    t_big = np.minimum(t_static, np.where(hit & is_big, t_true, np.inf))
    print(f"big-cluster prepass would cap {is_big.mean():.3f} of lanes "
          f"at their true t (B={B})", flush=True)

    dd = (dn * dn).sum(axis=0)
    caps = {"static": t_static, "bigcap": t_big, "oracle": t_oracle}
    chunk = 128
    nchunks = -(-ct // chunk)

    base_jobs = None
    for cap_name, t_clip in caps.items():
        # ok matrix chunked over clusters; accumulate per-group unions.
        group_counts = {g: np.zeros(R // g, np.int64)
                        for g in (1024, 256, 128, 64)}
        lane_counts = np.zeros(R, np.int64)
        for c0 in range(0, ct, chunk):
            cs = slice(c0, min(c0 + chunk, ct))
            cx = c_xyz[cs]
            r = c_r[cs]
            oc = on[None, :, :] - cx[:, :, None]         # (ch, 3, R)
            b = (dn[None] * oc).sum(axis=1)              # (ch, R)
            cc = (oc * oc).sum(axis=1) - (r ** 2)[:, None]
            disc = b * b - dd[None] * cc
            sq = np.sqrt(np.maximum(disc, 0.0))
            ok = (disc >= 0) & (t_clip[None] > 0) \
                & (-b + sq >= dd[None] * 1e-3) \
                & (-b - sq <= dd[None] * t_clip[None])
            lane_counts += ok.sum(axis=0)
            for g in group_counts:
                gc = ok.reshape(-1, R // g, g).any(axis=2).sum(axis=0)
                group_counts[g] += gc
        print(f"--- cap={cap_name}")
        print(f"  per-lane: mean {lane_counts.mean():6.1f} "
              f"p90 {np.percentile(lane_counts, 90):5.0f} "
              f"p99 {np.percentile(lane_counts, 99):5.0f} "
              f"max {lane_counts.max()}")
        for g, gc in sorted(group_counts.items(), reverse=True):
            jobs = gc.sum()
            if base_jobs is None:
                base_jobs = jobs  # first printed row: (1024, static)
            lane_pairs = jobs * g
            print(f"  g={g:5d}: union mean {gc.mean():6.1f} "
                  f"p90 {np.percentile(gc, 90):5.0f} "
                  f"p99 {np.percentile(gc, 99):5.0f} "
                  f"max {gc.max():5d} | jobs {jobs:8d} "
                  f"lane-pairs {lane_pairs / 1e6:7.1f}M", flush=True)


if __name__ == "__main__":
    main()
