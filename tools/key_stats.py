"""Sort-key study for the job-stream narrow phase (numpy, cached pop).

job_stats.py showed the per-lane survivor floor is ~15 clusters while
1024-lane tiles admit ~153 — and that finer ray GROUPS recover most of the
gap (g=128: 58.5). The group union is a property of the LANE ORDERING, so
this tool scores candidate coherence keys by the per-group exact unions
they produce, entirely offline:

  cur       — production key (dir_bits=2 octant, cell_bits=5 origin cells)
  cell6/7   — same shape, finer origin cells
  near      — per-lane nearest-surviving-cluster id (from the exact cull)
  near+oct  — nearest cluster major, direction octant minor
  oct+near  — direction octant major, nearest cluster minor

Run: python tools/key_stats.py   (first run needs the TPU; then cached)
"""
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tools.job_stats import load_population  # noqa: E402


def main():
    o, d, tm, t_true, idx = load_population()
    z = np.load("/tmp/job_stats_pop.npz")
    sph = z["spheres"]
    on = np.stack([np.asarray(c) for c in o])
    dn = np.stack([np.asarray(c) for c in d])
    tm = np.asarray(tm)
    R = on.shape[1]

    live_c = sph[:, 3] >= 0
    c_xyz = sph[live_c, 0:3].astype(np.float64)
    c_r = sph[live_c, 3].astype(np.float64)
    ct = c_r.shape[0]

    s_lo = (c_xyz - c_r[:, None]).min(axis=0)
    s_hi = (c_xyz + c_r[:, None]).max(axis=0)
    d_safe = np.where(np.abs(dn) > 1e-20, dn, np.where(dn >= 0, 1e-20, -1e-20))
    t1 = (s_lo[:, None] - on) / d_safe
    t2 = (s_hi[:, None] - on) / d_safe
    t_exit = np.maximum(t1, t2).min(axis=0)
    t_clip = np.minimum(tm, np.maximum(t_exit, 0.0))
    t_clip = np.where(tm > 0, t_clip, 0.0)

    dd = (dn * dn).sum(axis=0)
    chunk = 128
    nbytes = (ct + 7) // 8
    packed = np.zeros((R, ((ct + chunk - 1) // chunk) * (chunk // 8)),
                      np.uint8)
    near_e = np.full(R, np.inf)
    near_c = np.full(R, ct, np.int64)
    o64, d64 = on.astype(np.float64), dn.astype(np.float64)
    for c0 in range(0, ct, chunk):
        cs = slice(c0, min(c0 + chunk, ct))
        cx, r = c_xyz[cs], c_r[cs]
        oc = o64[None, :, :] - cx[:, :, None]
        b = (d64[None] * oc).sum(axis=1)
        cc = (oc * oc).sum(axis=1) - (r ** 2)[:, None]
        disc = b * b - dd[None] * cc
        sq = np.sqrt(np.maximum(disc, 0.0))
        ok = (disc >= 0) & (t_clip[None] > 0) \
            & (-b + sq >= dd[None] * 1e-3) & (-b - sq <= dd[None] * t_clip[None])
        pad = chunk - ok.shape[0]
        okp = np.pad(ok, ((0, pad), (0, 0))) if pad else ok
        packed[:, c0 // 8:c0 // 8 + chunk // 8] = np.packbits(
            okp, axis=0).T
        entry = np.where(ok, np.maximum((-b - sq) / dd[None], 0.0), np.inf)
        am = entry.argmin(axis=0)
        ae = entry[am, np.arange(R)]
        upd = ae < near_e
        near_e = np.where(upd, ae, near_e)
        near_c = np.where(upd, c0 + am, near_c)

    counts = np.unpackbits(packed, axis=1)[:, :ct].sum(axis=1)
    print(f"per-lane mean {counts.mean():.1f}", flush=True)

    from webgpu_raytracer_tpu.ops.tune import TuneConfig
    from tools.job_stats import coherence_perm
    import jax.numpy as jnp

    jo = tuple(jnp.asarray(c) for c in on)
    jd = tuple(jnp.asarray(c) for c in dn)
    jt = jnp.asarray(tm)

    octant = np.zeros(R, np.int64)
    dl = np.sqrt(dd)
    for a in range(3):
        q = np.clip(((dn[a] / np.maximum(dl, 1e-20)) + 1.0) * 2.0,
                    0, 3).astype(np.int64)
        octant = octant * 4 + q
    dead = tm <= 0

    orders = {}
    orders["cur"] = np.asarray(coherence_perm(jo, jd, jt, TuneConfig()))
    orders["cell6"] = np.asarray(coherence_perm(
        jo, jd, jt, TuneConfig(cell_bits=6)))
    orders["cell7"] = np.asarray(coherence_perm(
        jo, jd, jt, TuneConfig(cell_bits=7)))
    nc = np.where(dead, ct + 1, near_c)
    orders["near"] = np.argsort(nc * 64 + 0, kind="stable")
    orders["near+oct"] = np.argsort(nc * 64 + octant, kind="stable")
    orders["oct+near"] = np.argsort(octant * (ct + 2) + nc, kind="stable")

    for name, perm in orders.items():
        pp = packed[perm]
        line = f"{name:9s}:"
        for g in (256, 128, 64):
            grp = pp.reshape(R // g, g, -1)
            un = np.bitwise_or.reduce(grp, axis=1)
            cnt = np.unpackbits(un, axis=1)[:, :ct].sum(axis=1)
            jobs = cnt.sum()
            line += (f"  g={g}: mean {cnt.mean():6.1f} max {cnt.max():4d} "
                     f"jobs {jobs:7d} pairs {jobs * g / 1e6:5.1f}M")
        print(line, flush=True)


if __name__ == "__main__":
    main()
