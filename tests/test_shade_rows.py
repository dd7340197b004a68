"""Shade-kernel bounce path (ops/shade_rows) vs the jnp pipeline.

`ray_color_dense_rows` must reproduce `ray_color_dense`'s estimator: same
RNG streams, same sequencing, same material/NEE/MIS/RR math. The kernels
run under interpret mode on the CPU suite. Per-lane tolerances allow for
the bf16x3 sweep's CPU rounding (winner ties can flip on coplanar
geometry) and transcendental differences; a sequencing or math bug shifts
the mean or breaks most lanes, which these bounds catch.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from webgpu_raytracer_tpu.models.native import NativeWorld
from webgpu_raytracer_tpu.ops.dense_trace import (ray_color_dense,
                                                  ray_color_dense_rows)
from webgpu_raytracer_tpu.ops.rng import init_rng
from webgpu_raytracer_tpu.ops.v3 import V3
from webgpu_raytracer_tpu.render.resources import build_device_scene
from webgpu_raytracer_tpu.render.worldtris import build_world_tris


@pytest.mark.parametrize("scene_name", ["cornell", "mixed"])
def test_rows_path_matches_jnp_path(scene_name):
    res = 32
    world = NativeWorld(scene_name)
    world.update_camera(res, res)
    wt = build_world_tris(world)
    scene = build_device_scene(world)
    c = np.asarray(world.camera())
    R = res * res
    lane = jnp.arange(R, dtype=jnp.uint32)
    px = (lane % res).astype(jnp.float32)
    py = (lane // res).astype(jnp.float32)
    u = (px + 0.5) / res
    v = 1.0 - (py + 0.5) / res
    ro = V3(*(jnp.broadcast_to(c[k], (R,)) for k in range(3)))
    rd = V3(c[4] + u * c[8] + v * c[12] - c[0],
            c[5] + u * c[9] + v * c[13] - c[1],
            c[6] + u * c[10] + v * c[14] - c[2])
    rng = init_rng(lane, jnp.uint32(1))

    col_a, _, rays_a = ray_color_dense(wt, scene.textures, ro, rd, rng, 5)
    col_b, _, rays_b = ray_color_dense_rows(wt, scene.textures, ro, rd, rng,
                                            5, interpret=True)
    a = np.stack([np.asarray(col_a.x), np.asarray(col_a.y),
                  np.asarray(col_a.z)], 1)
    b = np.stack([np.asarray(col_b.x), np.asarray(col_b.y),
                  np.asarray(col_b.z)], 1)
    assert np.isfinite(b).all()
    # identical RNG streams -> identical paths except sweep-rounding ties
    rel = np.abs(a - b).max(1) / np.maximum(np.abs(a).max(1), 1e-3)
    frac_equal = (rel < 1e-3).mean()
    assert frac_equal > 0.95, f"{frac_equal:.3%} lanes match"
    assert abs(a.mean() - b.mean()) < 0.02 * max(a.mean(), 1e-3)
    # exact ray accounting must agree (counts are independent of rounding
    # only when path decisions agree; allow tie-flip slack)
    assert abs(float(np.asarray(rays_a)) - float(np.asarray(rays_b))) \
        <= 0.02 * float(np.asarray(rays_a))
