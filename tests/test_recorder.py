"""Recorder tests: frame loop, chunk serialization, abort, muxing."""

import os

import numpy as np
import pytest

from webgpu_raytracer_tpu import Renderer, RenderConfig
from webgpu_raytracer_tpu.render.recorder import (AbortFlag, VideoRecorder,
                                                  mux_frames)


@pytest.fixture(scope="module")
def renderer():
    cfg = RenderConfig(width=32, height=32, max_depth=3, shader_spp=1,
                       fps=10, duration=0.3, spp=2, batch=2)
    return Renderer("cornell", config=cfg)


def test_record_chunks(renderer):
    rec = VideoRecorder(renderer)
    frames = rec.record_chunks(renderer.config, start_frame=0, frame_count=3)
    assert len(frames) == 3
    assert [f.frame_index for f in frames] == [0, 1, 2]
    assert frames[0].key_frame
    assert all(f.data.startswith(b"\x89PNG") for f in frames)


def test_record_chunks_abort(renderer):
    rec = VideoRecorder(renderer)
    abort = AbortFlag()
    abort.abort()
    frames = rec.record_chunks(renderer.config, 0, 3, abort=abort)
    assert frames == []


def test_mux_frames(tmp_path, renderer):
    rec = VideoRecorder(renderer)
    frames = rec.record_chunks(renderer.config, start_frame=0, frame_count=2)
    # add a duplicate: must be deduped by frame index
    frames.append(frames[0])
    out = mux_frames(frames, fps=10, output=str(tmp_path / "clip"))
    assert os.path.exists(out)
    pngs = sorted(os.listdir(str(tmp_path / "clip_frames")))
    assert len(pngs) == 2


def test_record_full(tmp_path, renderer):
    rec = VideoRecorder(renderer)
    result = rec.record(renderer.config, output=str(tmp_path / "anim"))
    total = int(renderer.config.fps * renderer.config.duration)
    assert len(result.frames) == total
    assert result.output_path is not None
