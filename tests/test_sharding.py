"""Multi-chip sharding equivalence: sharded render == single-chip render.

Deterministic counter-based RNG (ops/rng.py) makes tile sharding bit-exact;
sample sharding differs only by psum summation order (tolerance ~1e-6).
Runs on the 8-virtual-CPU-device mesh from conftest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from webgpu_raytracer_tpu.models.native import NativeWorld
from webgpu_raytracer_tpu.ops.trace import accumulate, trace_pixels
from webgpu_raytracer_tpu.parallel.sharding import (
    make_mesh,
    sample_sharded_step,
    tile_sharded_step,
    tile_sample_sharded_step,
)
from webgpu_raytracer_tpu.render.resources import build_device_scene

W, H, DEPTH = 16, 16, 3


@pytest.fixture(scope="module")
def setup():
    world = NativeWorld("cornell")
    world.update_camera(W, H)
    scene = build_device_scene(world, pad_nodes_to=32, pad_tris_to=64,
                               pad_verts_to=64)
    camera = jnp.asarray(world.camera())
    return scene, camera


def reference_render(scene, camera, spp):
    col = trace_pixels(scene, camera, jnp.asarray(1, jnp.int32),
                       jnp.zeros(2, jnp.float32), W, H, spp, DEPTH)
    return np.asarray(accumulate(jnp.zeros((W * H, 4)), col,
                                 jnp.asarray(1, jnp.int32)))


def test_tile_sharding_bit_exact(setup):
    scene, camera = setup
    ref = reference_render(scene, camera, spp=2)
    mesh = make_mesh()
    step = tile_sharded_step(mesh, W, H, spp=2, max_depth=DEPTH)
    out = step(scene, camera, jnp.asarray(1, jnp.int32),
               jnp.zeros(2, jnp.float32), jnp.zeros((W * H, 4)))
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_sample_sharding_matches(setup):
    scene, camera = setup
    ref = reference_render(scene, camera, spp=8)
    mesh = make_mesh()
    step = sample_sharded_step(mesh, W, H, spp_total=8, max_depth=DEPTH)
    out = step(scene, camera, jnp.asarray(1, jnp.int32),
               jnp.zeros(2, jnp.float32), jnp.zeros((W * H, 4)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_tile_sample_2d_mesh(setup):
    scene, camera = setup
    ref = reference_render(scene, camera, spp=4)
    devices = jax.devices()[:8]
    mesh = jax.sharding.Mesh(np.array(devices).reshape(4, 2), ("tile", "sample"))
    step = tile_sample_sharded_step(mesh, W, H, spp_total=4, max_depth=DEPTH)
    out = step(scene, camera, jnp.asarray(1, jnp.int32),
               jnp.zeros(2, jnp.float32), jnp.zeros((W * H, 4)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)
