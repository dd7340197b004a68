"""G-buffer pass + post-process chain tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from webgpu_raytracer_tpu.models.native import NativeWorld
from webgpu_raytracer_tpu.ops.gbuffer import (pack_normal_oct, render_gbuffer,
                                              unpack_normal_oct)
from webgpu_raytracer_tpu.ops.postprocess import aces, firefly_clamp, postprocess
from webgpu_raytracer_tpu.ops.v3 import V3
from webgpu_raytracer_tpu.render.resources import build_device_scene
from webgpu_raytracer_tpu.render.worldtris import build_world_tris


def test_octahedral_roundtrip():
    rng = np.random.default_rng(3)
    n = rng.normal(size=(4096, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    v = V3(jnp.asarray(n[:, 0]), jnp.asarray(n[:, 1]), jnp.asarray(n[:, 2]))
    ox, oy = pack_normal_oct(v)
    out = unpack_normal_oct(ox, oy)
    back = np.stack([np.asarray(out.x), np.asarray(out.y), np.asarray(out.z)],
                    axis=1)
    np.testing.assert_allclose(back, n, atol=2e-6)


def test_gbuffer_cornell():
    world = NativeWorld("cornell")
    world.update_camera(32, 32)
    wt = build_world_tris(world)
    scene = build_device_scene(world)
    gb = render_gbuffer(wt, scene.textures, jnp.asarray(world.camera()),
                        32, 32)
    depth = np.asarray(gb.depth)
    inst = np.asarray(gb.inst_idx)
    # camera is inside the box: everything hits
    assert (inst >= 0).all()
    assert (depth < 1.0).all()
    albedo = np.asarray(gb.albedo)
    assert albedo.max() > 0.5  # white walls visible
    # normals decode to unit vectors
    n = unpack_normal_oct(jnp.asarray(gb.normal_oct[..., 0]),
                          jnp.asarray(gb.normal_oct[..., 1]))
    ln = np.sqrt(np.asarray(n.x)**2 + np.asarray(n.y)**2 + np.asarray(n.z)**2)
    np.testing.assert_allclose(ln, 1.0, atol=1e-5)


def test_gbuffer_misses_outside():
    world = NativeWorld("mesh")  # open scene: sky visible at top
    world.update_camera(32, 32)
    wt = build_world_tris(world)
    scene = build_device_scene(world)
    gb = render_gbuffer(wt, scene.textures, jnp.asarray(world.camera()),
                        32, 32)
    depth = np.asarray(gb.depth)
    assert (depth[0] == 1.0).any()  # top rows miss
    assert (np.asarray(gb.inst_idx)[0] == -1).any()


def test_aces_range():
    x = jnp.asarray(np.linspace(0, 100, 512, dtype=np.float32))
    y = np.asarray(aces(x))
    assert (y >= 0).all() and (y <= 1).all()
    assert y[-1] > 0.95  # bright in -> ~1 out


def test_firefly_clamp():
    img = np.full((8, 8, 3), 0.5, np.float32)
    img[4, 4] = 100.0  # single firefly
    out = np.asarray(firefly_clamp(jnp.asarray(img)))
    assert out[4, 4, 0] <= 0.5 * 3.0 + 0.1 + 1e-5
    np.testing.assert_allclose(out[0, 0], 0.5)


def test_postprocess_end_to_end():
    rng = np.random.default_rng(5)
    H = W = 16
    acc = np.abs(rng.normal(0.4, 0.1, size=(H, W, 4))).astype(np.float32)
    acc[..., 3] = 4.0  # 4 accumulated frames
    hist = np.zeros((H, W, 3), np.float32)
    ldr, new_hist = postprocess(jnp.asarray(acc), jnp.asarray(hist),
                                jnp.asarray(4, jnp.int32),
                                jnp.zeros(2, jnp.float32))
    ldr = np.asarray(ldr)
    assert ldr.dtype == np.uint8 and ldr.shape == (H, W, 3)
    assert np.asarray(new_hist).shape == (H, W, 3)
    assert np.isfinite(np.asarray(new_hist)).all()
    # history converges toward the radiance over repeated presents
    prev = new_hist
    for f in range(5, 40):
        _, prev = postprocess(jnp.asarray(acc), prev,
                              jnp.asarray(f, jnp.int32),
                              jnp.zeros(2, jnp.float32))
    rad = acc[..., :3] / 4.0
    err = np.abs(np.asarray(prev) - rad).mean()
    assert err < 0.2
