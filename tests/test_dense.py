"""Dense (world-triangle matmul) backend vs oracle and vs BVH backend."""

import numpy as np
import jax.numpy as jnp
import pytest

from webgpu_raytracer_tpu.models.native import NativeWorld
from webgpu_raytracer_tpu.ops.dense import dense_closest, dense_shadow
from webgpu_raytracer_tpu.ops.dense_trace import trace_pixels_dense
from webgpu_raytracer_tpu.ops.trace import trace_pixels
from webgpu_raytracer_tpu.render.resources import build_device_scene
from webgpu_raytracer_tpu.render.worldtris import build_world_tris

from tests.oracle import intersect_brute


@pytest.mark.parametrize("scene_name", ["cornell", "viewer", "mesh"])
def test_dense_closest_matches_oracle(scene_name):
    rng = np.random.default_rng(7)
    world = NativeWorld(scene_name)
    wt = build_world_tris(world)
    n = 256
    ro = rng.uniform(-3, 3, size=(n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)

    t, idx = dense_closest(wt, jnp.asarray(ro), jnp.asarray(rd))
    t, idx = np.asarray(t), np.asarray(idx)
    t_ref, tri_ref, inst_ref = intersect_brute(
        world, ro.astype(np.float64), rd.astype(np.float64))

    agree = (idx >= 0) == (inst_ref >= 0)
    assert agree.mean() > 0.99
    both = agree & (idx >= 0)
    np.testing.assert_allclose(t[both], t_ref[both], rtol=2e-3, atol=2e-4)
    wt_tri = np.asarray(wt.tri_idx)
    assert (wt_tri[idx[both]] == tri_ref[both]).mean() > 0.9  # coplanar ties


def test_dense_shadow_consistency():
    rng = np.random.default_rng(11)
    world = NativeWorld("cornell")
    wt = build_world_tris(world)
    n = 512
    ro = rng.uniform(-0.9, 0.9, size=(n, 3)).astype(np.float32)
    ro[:, 1] = np.abs(ro[:, 1]) + 0.05
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)

    t, idx = dense_closest(wt, jnp.asarray(ro), jnp.asarray(rd))
    t, has = np.asarray(t), np.asarray(idx) >= 0
    occ = np.asarray(dense_shadow(wt, jnp.asarray(ro), jnp.asarray(rd),
                                  t_max=jnp.asarray(t + 1e-2)))
    assert occ[has].all()
    occ2 = np.asarray(dense_shadow(wt, jnp.asarray(ro), jnp.asarray(rd),
                                   t_max=jnp.asarray(np.maximum(t * 0.5, 2e-3))))
    assert not occ2[has].any()


def test_dense_trace_matches_bvh_trace():
    """Both backends consume identical RNG -> near-identical radiance."""
    world = NativeWorld("cornell")
    world.update_camera(32, 32)
    scene = build_device_scene(world)
    wt = build_world_tris(world)
    cam = jnp.asarray(world.camera())
    fc = jnp.asarray(1, jnp.int32)
    j = jnp.zeros(2, jnp.float32)
    a = np.asarray(trace_pixels(scene, cam, fc, j, 32, 32, 1, 5))
    b = np.asarray(trace_pixels_dense(wt, scene.textures, cam, fc, j,
                                      32, 32, 1, 5))
    assert np.isclose(a, b, rtol=1e-3, atol=1e-3).mean() > 0.995
    assert abs(a.mean() - b.mean()) < 1e-4


def test_banded_trace_bit_identical():
    """Strip-mining (the 1080p working-set fix) must not change a single
    bit, whichever band axis: per-pixel RNG and arithmetic depend only on
    global pixel coords."""
    import webgpu_raytracer_tpu.ops.dense_trace as dt
    from webgpu_raytracer_tpu.ops.tune import TuneConfig

    world = NativeWorld("cornell")
    world.update_camera(48, 48)
    scene = build_device_scene(world)
    wt = build_world_tris(world)
    cam = jnp.asarray(world.camera())
    fc = jnp.asarray(2, jnp.int32)
    j = jnp.zeros(2, jnp.float32)
    args = (wt, scene.textures, cam, fc, j, 48, 48, 1, 5)
    a, ra = dt.trace_pixels_dense(*args, with_stats=True)
    tune = TuneConfig(band_min_r=0, band_target=48 * 12)
    assert dt._pick_bands(48, 48, tune) == 4
    b, rb = dt.trace_pixels_dense(*args, with_stats=True, tune=tune)
    assert (np.asarray(a) == np.asarray(b)).all()
    assert float(ra) == float(rb)


def test_tail_compaction_matches():
    """Static tail compaction (live lanes -> R/div buffers after RR
    collapses liveness) must reproduce the uncompacted frame, on the
    compacted branch, the overflow fallback, and a two-stage ladder.
    At 64x48 d8 with div=4 the budget is 2048 lanes: ~77 live at bounce 5
    exercises the compact branch; a stage at depth 1 (~2.4k live)
    exercises the fallback."""
    import webgpu_raytracer_tpu.ops.dense_trace as dt
    from webgpu_raytracer_tpu.ops.tune import TuneConfig

    world = NativeWorld("cornell")
    world.update_camera(64, 48)
    scene = build_device_scene(world)
    wt = build_world_tris(world)
    cam = jnp.asarray(world.camera())
    args = (wt, scene.textures, cam, jnp.asarray(2, jnp.int32),
            jnp.zeros(2, jnp.float32), 64, 48, 1, 8)
    a, ra = dt.trace_pixels_dense(*args, with_stats=True)
    for stages in (((5, 4),),        # compacted branch
                   ((1, 4),),        # overflow -> same-width fallback
                   ((1, 4), (5, 4)),  # stage 1 overflows, stage 2 compacts
                   ((4, 4), (6, 12))):  # two-stage ladder, both compact
        tune = TuneConfig(tail_min_r=0, tail_align=256, tail_stages=stages)
        b, rb = dt.trace_pixels_dense(*args, with_stats=True, tune=tune)
        assert (np.asarray(a) == np.asarray(b)).all(), stages
        assert float(ra) == float(rb), stages


def test_column_banded_landscape_matches():
    """Landscape frames auto-select column strips. Per-pixel math depends
    only on global pixel coords; but the
    column program is a DIFFERENT XLA program than the row/unbanded one and
    CPU codegen contracts the ray-gen chain with different FMA choices:
    ~90% of pixels stay bit-equal, the rest shift by ~1 ULP, and a <1%
    tail of near-tie edge hits flips winner (bounded absolute jumps; a
    flipped hit also shifts that lane's path length, so ray counts may
    drift by a few rays in ten thousand).
    Verified separately: within ONE program, arbitrary batch permutations
    are bit-identical (the sweep itself is arrangement-insensitive).
    Covers the G-buffer-seeded path too (seed channel transposed/strip)."""
    import webgpu_raytracer_tpu.ops.dense_trace as dt
    from webgpu_raytracer_tpu.ops.gbuffer import render_gbuffer
    from webgpu_raytracer_tpu.ops.tune import TuneConfig

    world = NativeWorld("cornell")
    world.update_camera(64, 40)
    scene = build_device_scene(world)
    wt = build_world_tris(world)
    cam = jnp.asarray(world.camera())
    fc = jnp.asarray(1, jnp.int32)
    j = jnp.zeros(2, jnp.float32)
    seed = render_gbuffer(wt, scene.textures, cam, 64, 40,
                          jitter=j).wt_idx.reshape(-1)
    for sd in (None, seed):
        args = (wt, scene.textures, cam, fc, j, 64, 40, 1, 4)
        a, ra = dt.trace_pixels_dense(*args, with_stats=True, seed_wt_idx=sd)
        tune = TuneConfig(band_min_r=0, band_target=40 * 16)
        assert dt._pick_bands(40, 64, tune) == 4  # 4 column strips of 16
        b, rb = dt.trace_pixels_dense(*args, with_stats=True, seed_wt_idx=sd,
                                      tune=tune)
        a, b = np.asarray(a), np.asarray(b)
        close = np.isclose(a, b, rtol=1e-5, atol=1e-6).all(axis=1).mean()
        assert close >= 0.99, close
        assert np.abs(a - b).mean() < 1e-4
        assert abs(float(ra) - float(rb)) <= 1e-3 * float(ra)


def test_dense_lights_mapping():
    world = NativeWorld("cornell")
    wt = build_world_tris(world)
    assert int(wt.light_count) == 2
    lw = np.asarray(wt.light_wt)
    mats = np.asarray(wt.mat)
    assert (mats[lw] == 3).all()
