"""Brute-force numpy reference intersector (the test oracle).

Independent of the BVH: intersects rays against every triangle of every
instance directly. Used to validate the device traversal
(ops/intersect.py) which must agree exactly on (t, tri, inst).
"""

from __future__ import annotations

import numpy as np

T_MIN = 1e-3
T_MAX = 1e30


def unpack_world(world):
    topo = np.asarray(world.topology(), np.uint32).reshape(-1, 20)
    tri_v = topo[:, 0:3].astype(np.int64)
    tri_geom = topo[:, 3].astype(np.int64)
    pos = np.asarray(world.vertices(), np.float32).reshape(-1, 4)[:, :3]
    inst = np.asarray(world.instances(), np.float32).reshape(-1, 36)
    n_inst = inst.shape[0]
    tf = inst[:, 0:16].reshape(n_inst, 4, 4).transpose(0, 2, 1)
    inv = inst[:, 16:32].reshape(n_inst, 4, 4).transpose(0, 2, 1)
    inst_geom = inst[:, 32:36].copy().view(np.uint32)[:, 2].astype(np.int64)
    return tri_v, tri_geom, pos, tf, inv, inst_geom


def intersect_brute(world, ro, rd, t_min=T_MIN, t_max=T_MAX):
    """Returns (t, tri_idx, inst_idx) arrays; -1 indices on miss."""
    tri_v, tri_geom, pos, tf, inv, inst_geom = unpack_world(world)
    R = ro.shape[0]
    best_t = np.full(R, t_max, np.float64)
    best_tri = np.full(R, -1, np.int64)
    best_inst = np.full(R, -1, np.int64)

    v0_all = pos[tri_v[:, 0]].astype(np.float64)
    v1_all = pos[tri_v[:, 1]].astype(np.float64)
    v2_all = pos[tri_v[:, 2]].astype(np.float64)

    for i in range(tf.shape[0]):
        sel = np.nonzero(tri_geom == inst_geom[i])[0]
        if sel.size == 0:
            continue
        v0, v1, v2 = v0_all[sel], v1_all[sel], v2_all[sel]
        rot = inv[i, :3, :3].astype(np.float64)
        lro = ro @ rot.T + inv[i, :3, 3]
        lrd = rd @ rot.T

        e1 = v1 - v0
        e2 = v2 - v0
        # (R, T) batched Moller-Trumbore
        h = np.cross(lrd[:, None, :], e2[None, :, :])
        a = np.einsum("tj,rtj->rt", e1, h)
        ok = np.abs(a) >= 1e-6
        f = np.where(ok, 1.0 / np.where(ok, a, 1.0), 0.0)
        s = lro[:, None, :] - v0[None, :, :]
        u = f * np.einsum("rtj,rtj->rt", s, h)
        q = np.cross(s, e1[None, :, :])
        v = f * np.einsum("rj,rtj->rt", lrd, q)
        t = f * np.einsum("tj,rtj->rt", e2, q)
        hit = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
        hit &= (t > t_min) & (t < best_t[:, None])
        t_masked = np.where(hit, t, np.inf)
        tri_best = np.argmin(t_masked, axis=1)
        t_best = t_masked[np.arange(R), tri_best]
        improved = np.isfinite(t_best)
        best_t = np.where(improved, t_best, best_t)
        best_tri = np.where(improved, sel[tri_best], best_tri)
        best_inst = np.where(improved, i, best_inst)

    return best_t.astype(np.float32), best_tri, best_inst
