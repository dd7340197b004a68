"""App-shell integration: animated render loop, animation selection, and
worker reconnect resumption through the CLI-level code paths.

Covers the reference behaviors:
- interactive rAF loop with scene ticks every updateInterval frames +
  accumulation reset on new data (src/main.ts:119-181)
- animation clip selection applied locally and via RenderConfig
  (src/ui/UIManager.ts anim select, DistributedWorker.ts:190-200)
- worker identity/job resumption across a dropped connection using ONE
  WorkerClient, as cli.cmd_worker now does (SignalingClient.ts:52-59,
  server.ts:240-289)
"""

import threading
import time

import numpy as np
import pytest

from webgpu_raytracer_tpu.config import RenderConfig

from .glb_fixture import two_clip_skinned_glb


def test_anim_index_selects_clip():
    """anim_index in RenderConfig selects the clip at Renderer construction:
    clip 'sway' (joint +x) and clip 'lift' (joint +y) deform the skinned
    strip differently at t=0.5."""
    from webgpu_raytracer_tpu.render.renderer import Renderer

    glb = two_clip_skinned_glb()
    cfg0 = RenderConfig(width=16, height=16, anim_index=0)
    cfg1 = RenderConfig(width=16, height=16, anim_index=1)
    r0 = Renderer("viewer", glb_data=glb, config=cfg0)
    r1 = Renderer("viewer", glb_data=glb, config=cfg1)
    assert r0.world.animation_count() == 2
    assert [r0.world.animation_name(i) for i in range(2)] == ["sway", "lift"]

    r0.update_scene(0.5)
    r1.update_scene(0.5)
    # skinned vertices must differ between the clips
    v0 = np.asarray(r0.world.vertices())
    v1 = np.asarray(r1.world.vertices())
    assert v0.shape == v1.shape
    assert not np.allclose(v0, v1)


def test_set_animation_switches_clip():
    from webgpu_raytracer_tpu.render.renderer import Renderer

    glb = two_clip_skinned_glb()
    r = Renderer("viewer", glb_data=glb,
                 config=RenderConfig(width=16, height=16))
    r.update_scene(0.5)
    before = np.asarray(r.world.vertices()).copy()
    r.set_animation(1, time=0.5)
    after = np.asarray(r.world.vertices())
    assert not np.allclose(before, after)
    assert r.config.anim_index == 1
    assert r.frame_count == 0  # set_animation resets accumulation


def test_cli_animated_render(tmp_path):
    """`cli render --animate` ticks the world through the async bridge,
    re-uploads and resets accumulation — and produces an image."""
    from webgpu_raytracer_tpu import cli

    glb_path = tmp_path / "quad.glb"
    glb_path.write_bytes(two_clip_skinned_glb())
    out = tmp_path / "anim.png"
    cli.main([
        "render", "--scene", "viewer", "--model", str(glb_path),
        "--width", "32", "--height", "32", "--depth", "3",
        "--frames", "6", "--animate", "--update-interval", "2",
        "--fps", "8", "--anim", "1", "--output", str(out),
    ])
    assert out.exists()
    from PIL import Image

    img = np.asarray(Image.open(out))
    assert img.shape == (32, 32, 3)
    assert img.mean() > 1.0  # not black


def test_worker_single_client_reconnect_resumes():
    """cmd_worker-style loop: ONE WorkerClient whose connection drops mid-job
    reconnects, resumes its session identity, and delivers the buffered
    result so the render completes."""
    from webgpu_raytracer_tpu.parallel.cluster import Coordinator

    from .test_cluster import make_worker

    coord = Coordinator(secret="s3cret", grace_period_s=5.0)
    try:
        coord.set_scene(RenderConfig(fps=30, duration=1.0, spp=4), "cornell")
        # slow worker: 40ms/frame, 10-frame jobs -> ~0.4s per job
        w = make_worker(coord, delay=0.04)

        # the cmd_worker loop: same client object across reconnects
        def worker_loop():
            for _ in range(10):
                try:
                    w.connect()
                    w.run()
                except (ConnectionError, OSError):
                    pass
                if w._stop:
                    return
                time.sleep(0.1)

        t = threading.Thread(target=worker_loop, daemon=True)
        t.start()
        time.sleep(0.3)
        first_session = w.session
        assert first_session is not None
        coord.start_render(total_frames=30, job_batch=10)
        time.sleep(0.15)  # let the first job start
        # kill the connection mid-job (the worker keeps rendering, buffers
        # the result, and the loop reconnects with the same session)
        w._sock.close()
        assert coord.wait(20.0), "render did not complete after reconnect"
        frames = coord.collect_frames()
        assert [f.frame_index for f in frames] == list(range(30))
        assert w.session[0] == first_session[0]  # same identity reclaimed
        assert len(coord.admin_status()["workers"]) == 1
        w.close()
    finally:
        coord.close()


def test_preview_server_streams_frames():
    """PreviewServer (cli render --preview): the / page serves, /stats
    reflects the latest publish, and /stream yields a decodable JPEG part
    per published frame (the reference's live canvas loop analogue,
    src/main.ts:119-181)."""
    import io
    import urllib.request

    from PIL import Image

    from webgpu_raytracer_tpu.render.preview import PreviewServer

    srv = PreviewServer(port=0)
    try:
        img = np.zeros((24, 32, 3), np.uint8)
        img[:, :16] = (255, 0, 0)
        srv.publish(img, stats="fps=1.0")

        page = urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/", timeout=5).read()
        assert b"/stream" in page
        stats = urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/stats", timeout=5).read()
        assert stats == b"fps=1.0"

        resp = urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/stream", timeout=5)
        assert "multipart/x-mixed-replace" in resp.headers["Content-Type"]

        def read_part():
            assert resp.readline().strip() == b"--frame"
            headers = {}
            while True:
                line = resp.readline().strip()
                if not line:
                    break
                k, v = line.split(b":", 1)
                headers[k.strip().lower()] = v.strip()
            n = int(headers[b"content-length"])
            body = resp.read(n)
            resp.readline()  # trailing CRLF
            return body

        part = read_part()
        decoded = Image.open(io.BytesIO(part))
        assert decoded.size == (32, 24)
        # publish a second frame; the stream must deliver a new part
        srv.publish(np.full((24, 32, 3), 200, np.uint8))
        part2 = read_part()
        assert part2 != part
    finally:
        srv.close()


def test_cli_render_preview_smoke(tmp_path):
    """cli render --preview 0 renders to completion with the server up."""
    from webgpu_raytracer_tpu.cli import main as cli_main

    out = tmp_path / "p.png"
    cli_main(["render", "--scene", "cornell", "--width", "16", "--height",
              "16", "--depth", "2", "--frames", "2", "--preview", "0",
              "--output", str(out)])
    assert out.exists()
