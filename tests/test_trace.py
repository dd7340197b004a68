"""Path tracer behavior tests: determinism, accumulation, light transport.

Monte-Carlo-aware: statistical assertions use generous tolerances per the
BASELINE "within MC noise" criterion.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from webgpu_raytracer_tpu.models.native import NativeWorld
from webgpu_raytracer_tpu.ops.rng import init_rng, rand_pcg
from webgpu_raytracer_tpu.ops.trace import accumulate, trace_pixels
from webgpu_raytracer_tpu.render.resources import build_device_scene

W = H = 32
DEPTH = 5


@pytest.fixture(scope="module")
def cornell():
    world = NativeWorld("cornell")
    world.update_camera(W, H)
    scene = build_device_scene(world)
    return scene, jnp.asarray(world.camera())


def render(scene, camera, frame, spp=1, depth=DEPTH):
    return np.asarray(
        trace_pixels(scene, camera, jnp.asarray(frame, jnp.int32),
                     jnp.zeros(2, jnp.float32), W, H, spp, depth)
    )


def test_rng_uniformity():
    state = init_rng(jnp.arange(4096, dtype=jnp.uint32), jnp.uint32(3))
    vals = []
    for _ in range(8):
        state, u = rand_pcg(state)
        vals.append(np.asarray(u))
    v = np.stack(vals)
    assert 0.0 <= v.min() and v.max() <= 1.0
    assert abs(v.mean() - 0.5) < 0.01
    assert abs(v.std() - np.sqrt(1 / 12)) < 0.01


def test_determinism(cornell):
    scene, camera = cornell
    a = render(scene, camera, 1)
    b = render(scene, camera, 1)
    np.testing.assert_array_equal(a, b)


def test_frames_decorrelated(cornell):
    scene, camera = cornell
    a = render(scene, camera, 1)
    b = render(scene, camera, 2)
    assert not np.array_equal(a, b)


def test_radiance_finite_and_lit(cornell):
    scene, camera = cornell
    col = render(scene, camera, 1, spp=2)
    assert np.isfinite(col).all()
    assert (col >= 0).all()
    assert col.mean() > 0.05  # the box is lit
    # ceiling light pixels report the light's albedo (20) when hit directly
    assert col.max() <= 25.0


def test_light_pixels_emit_exact(cornell):
    """Pixels that directly see the emissive quad return its radiance (20)."""
    scene, camera = cornell
    col = render(scene, camera, 1, spp=1).reshape(H, W, 3)
    # the ceiling light is visible near the top-center of the frame
    lit = (np.abs(col - 20.0) < 1e-4).all(axis=-1)
    assert lit.any(), "no pixel directly sees the area light"


def test_spp_reduces_variance(cornell):
    """Mean over many 1-spp frames ~ equals one high-spp frame (MC mean)."""
    scene, camera = cornell
    many = np.mean([render(scene, camera, f) for f in range(1, 9)], axis=0)
    one = render(scene, camera, 101, spp=8)
    # same estimator, different seeds: means agree within MC noise
    assert abs(many.mean() - one.mean()) / one.mean() < 0.1


def test_accumulate_semantics():
    prev = jnp.ones((4, 4), jnp.float32) * 5.0
    col = jnp.ones((4, 3), jnp.float32)
    first = np.asarray(accumulate(prev, col, jnp.asarray(1, jnp.int32)))
    np.testing.assert_array_equal(first[:, 3], 1.0)  # reset on frame 1
    later = np.asarray(accumulate(prev, col, jnp.asarray(3, jnp.int32)))
    np.testing.assert_array_equal(later[:, 3], 6.0)  # sum + count

def test_depth_increases_energy(cornell):
    """More bounces -> more (or equal) transported energy on average."""
    scene, camera = cornell
    d2 = np.mean([render(scene, camera, f, depth=2) for f in range(1, 5)])
    d6 = np.mean([render(scene, camera, f, depth=6) for f in range(1, 5)])
    assert d6 >= d2 * 0.95
