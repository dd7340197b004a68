"""Checkpoint/resume tests (SURVEY.md §5.4 semantics)."""

import numpy as np

from webgpu_raytracer_tpu import Renderer, RenderConfig
from webgpu_raytracer_tpu.render.checkpoint import load_checkpoint, save_checkpoint


def test_checkpoint_roundtrip(tmp_path):
    cfg = RenderConfig(width=24, height=24, max_depth=3, shader_spp=1)
    r = Renderer("cornell", config=cfg)
    for _ in range(3):
        r.render_frame()
    r.present()
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, r)

    # resumed renderer continues exactly where the original left off
    r2 = Renderer("cornell", config=cfg)
    assert load_checkpoint(path, r2)
    assert r2.frame_count == r.frame_count
    np.testing.assert_array_equal(np.asarray(r2.accum), np.asarray(r.accum))

    r.render_frame()
    r2.render_frame()
    np.testing.assert_array_equal(np.asarray(r2.accum), np.asarray(r.accum))


def test_checkpoint_rejects_mismatch(tmp_path):
    r = Renderer("cornell", config=RenderConfig(width=24, height=24,
                                                max_depth=3, shader_spp=1))
    r.render_frame()
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, r)

    other = Renderer("cornell", config=RenderConfig(width=32, height=32,
                                                    max_depth=3, shader_spp=1))
    assert not load_checkpoint(path, other)
    assert other.frame_count == 0


def test_checkpoint_missing(tmp_path):
    r = Renderer("cornell", config=RenderConfig(width=24, height=24,
                                                max_depth=3, shader_spp=1))
    assert not load_checkpoint(str(tmp_path / "nope"), r)
