"""Golden statistics per preset: Monte-Carlo-aware regression guards.

The BASELINE criterion is "images match within Monte Carlo noise"; these
tests pin the mean/variance statistics of low-res renders so estimator
regressions (e.g. broken MIS weights or NEE pdfs) are caught without
bit-exact golden images. Values were recorded from the validated build
(dense == bvh == f64-oracle traversal).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from webgpu_raytracer_tpu.models.native import NativeWorld
from webgpu_raytracer_tpu.ops.dense_trace import trace_pixels_dense
from webgpu_raytracer_tpu.render.resources import build_device_scene
from webgpu_raytracer_tpu.render.worldtris import build_world_tris

# (scene, depth, frames): expected mean radiance and tolerance. Tolerances
# are ~5 sigma of the frame-averaged MC estimate at 32x32 x frames samples.
GOLDEN = {
    "cornell": (5, 8, 0.2597, 0.03),
    "viewer": (4, 8, 0.5219, 0.05),
}


@pytest.mark.parametrize("scene_name", sorted(GOLDEN))
def test_golden_mean_radiance(scene_name):
    depth, frames, expected, tol = GOLDEN[scene_name]
    world = NativeWorld(scene_name)
    world.update_camera(32, 32)
    wt = build_world_tris(world)
    scene = build_device_scene(world)
    cam = jnp.asarray(world.camera())
    acc = np.zeros((32 * 32, 3), np.float32)
    for f in range(1, frames + 1):
        col = trace_pixels_dense(wt, scene.textures, cam,
                                 jnp.asarray(f, jnp.int32),
                                 jnp.zeros(2, jnp.float32), 32, 32, 1, depth)
        acc += np.asarray(col)
    mean = float(acc.mean()) / frames
    assert abs(mean - expected) < tol, (
        f"{scene_name}: mean radiance {mean:.4f} departed from golden "
        f"{expected} +- {tol}")
