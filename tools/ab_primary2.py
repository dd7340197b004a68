"""Does thin-lens DoF explain the in-frame primary-sweep cost? (spheres)

The d1 frame's primary sweep region is ~188 ms while a pinhole-ray
standalone sweep is ~75 ms. This times the SAME standalone sweep on the
EXACT in-frame primary population (PCG lens samples, lens_radius from the
camera block) vs the pinhole one.

Run: python tools/ab_primary2.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bench import build, tunnel_rt  # noqa: E402
import webgpu_raytracer_tpu.ops.pallas_dense as pd  # noqa: E402
from webgpu_raytracer_tpu.ops import bsdf  # noqa: E402
from webgpu_raytracer_tpu.ops.rng import init_rng, rand_n  # noqa: E402
from webgpu_raytracer_tpu.ops.v3 import V3  # noqa: E402
from webgpu_raytracer_tpu.ops.tune import TuneConfig  # noqa: E402
from tools.ab_primary import camera_rays  # noqa: E402


def dof_rays(camera, R=512 * 512):
    cam = camera
    lane = jnp.arange(R, dtype=jnp.uint32)
    gx = lane % 512
    gy = lane // 512
    rng = init_rng(gy * jnp.uint32(512) + gx, jnp.uint32(1))
    rng, (dr1, dr2) = rand_n(rng, 2)
    dx, dy = bsdf.random_in_unit_disk(dr1, dr2)
    rdx = cam[3] * dx
    rdy = cam[3] * dy
    off = V3(cam[16] * rdx + cam[20] * rdy,
             cam[17] * rdx + cam[21] * rdy,
             cam[18] * rdx + cam[22] * rdy)
    u = (gx.astype(jnp.float32) + 0.5) / 512
    v = 1.0 - (gy.astype(jnp.float32) + 0.5) / 512
    d = V3(cam[4] + u * cam[8] + v * cam[12] - cam[0],
           cam[5] + u * cam[9] + v * cam[13] - cam[1],
           cam[6] + u * cam[10] + v * cam[14] - cam[2]) - off
    o = V3(cam[0] + off.x, cam[1] + off.y, cam[2] + off.z)
    return (o.x, o.y, o.z), (d.x, d.y, d.z)


def main():
    tunnel_rt()
    world, wt, scene, camera = build("spheres")
    R = 512 * 512
    act = jnp.ones(R, bool)
    po, pdir = camera_rays(camera)
    do, ddir = map(lambda t: tuple(np.asarray(c) for c in t),
                   jax.jit(dof_rays)(camera))
    do = tuple(jnp.asarray(c) for c in do)
    ddir = tuple(jnp.asarray(c) for c in ddir)
    print("lens_radius", float(camera[3]), flush=True)

    jobs = TuneConfig(narrow="jobs")
    fns = {
        "pin_jobs": jax.jit(lambda o, d: pd._run3(
            wt, o, d, 1e30, act, 1e-3, False, True, tune=jobs)[0].sum()),
        "dof_jobs": None,
        "pin_scan": jax.jit(lambda o, d: pd._run2(
            wt, o, d, 1e30, act, 1e-3, False, True)[0].sum()),
        "dof_scan": None,
    }
    fns["dof_jobs"] = fns["pin_jobs"]
    fns["dof_scan"] = fns["pin_scan"]
    args = {"pin_jobs": (po, pdir), "dof_jobs": (do, ddir),
            "pin_scan": (po, pdir), "dof_scan": (do, ddir)}
    for name in fns:
        np.asarray(fns[name](*args[name]))
        print(f"warm {name}", flush=True)
    for rnd in range(4):
        line = []
        for name, f in fns.items():
            t0 = time.perf_counter()
            for _ in range(5):
                out = f(*args[name])
            np.asarray(out)
            line.append(f"{name}: {(time.perf_counter() - t0) / 5 * 1e3:7.2f} ms")
        print(f"round {rnd}: " + "   ".join(line), flush=True)


if __name__ == "__main__":
    main()
