"""Distributed render-farm tests: job queue, FSM, fault tolerance.

Exercises the reference's elastic-recovery semantics (SURVEY.md §5.3) over
real localhost TCP with fake renderers (no device work): auth, scene
broadcast, assignment, dedupe, grace-period requeue, session resumption,
late-join scene sync, abort, and frame-ordered mux.
"""

import threading
import time

import numpy as np
import pytest

from webgpu_raytracer_tpu.config import RenderConfig
from webgpu_raytracer_tpu.parallel import protocol as P
from webgpu_raytracer_tpu.parallel.cluster import Coordinator, WorkerClient
from webgpu_raytracer_tpu.render.recorder import EncodedFrame


class FakeRenderer:
    """Stands in for Renderer; the fake recorder below does the work."""

    def __init__(self, config):
        self.config = config


class FakeRecorder:
    """Generates deterministic fake frames instantly."""

    def __init__(self, renderer, delay=0.0):
        self.renderer = renderer
        self.delay = delay

    def record_chunks(self, config, start_frame=0, frame_count=None,
                      on_progress=None, abort=None):
        frames = []
        for k in range(frame_count):
            if abort is not None and abort.aborted:
                break
            if self.delay:
                time.sleep(self.delay)
            idx = start_frame + k
            frames.append(EncodedFrame(
                frame_index=idx,
                timestamp_us=idx * 33333,
                key_frame=idx % 30 == 0,
                data=f"frame-{idx}".encode(),
            ))
        return frames


def make_worker(coord, secret="s3cret", delay=0.0, session=None):
    def factory(config, scene_name, file_type, payload):
        return FakeRenderer(config)

    w = WorkerClient("127.0.0.1", coord.port, secret=secret,
                     renderer_factory=factory, session=session)
    # patch the recorder class used after scene load
    orig_load = w._load_scene

    def load_scene():
        orig_load()
        w._recorder = FakeRecorder(w._renderer, delay=delay)

    w._load_scene = load_scene
    return w


def run_worker(w):
    t = threading.Thread(target=lambda: (w.connect(), w.run()), daemon=True)
    t.start()
    return t


@pytest.fixture
def coord():
    c = Coordinator(secret="s3cret", grace_period_s=0.5)
    yield c
    c.close()


def test_auth_rejects_bad_secret(coord):
    w = make_worker(coord, secret="wrong")
    with pytest.raises(ConnectionError):
        w.connect()


def test_basic_render_roundtrip(coord):
    coord.set_scene(RenderConfig(fps=30, duration=1.0, spp=4), "cornell")
    w = make_worker(coord)
    run_worker(w)
    time.sleep(0.3)
    coord.start_render(total_frames=30, job_batch=10)
    assert coord.wait(10.0)
    frames = coord.collect_frames()
    assert [f.frame_index for f in frames] == list(range(30))
    assert frames[7].data == b"frame-7"


def test_work_stealing_across_workers(coord):
    coord.set_scene(RenderConfig(fps=30, duration=2.0), "cornell")
    workers = [make_worker(coord, delay=0.002) for _ in range(3)]
    for w in workers:
        run_worker(w)
    time.sleep(0.5)
    coord.start_render(total_frames=60, job_batch=5)
    assert coord.wait(20.0)
    frames = coord.collect_frames()
    assert len(frames) == 60
    status = coord.admin_status()
    assert len(status["workers"]) == 3


def test_grace_period_requeue(coord):
    """A worker dying mid-job gets its job requeued after the grace period
    and another worker completes the render."""
    coord.set_scene(RenderConfig(fps=30, duration=1.0), "cornell")
    slow = make_worker(coord, delay=0.5)  # will hold its job for a while
    run_worker(slow)
    time.sleep(0.3)
    coord.start_render(total_frames=20, job_batch=10)
    time.sleep(0.3)
    slow.close()  # dies mid-job

    fast = make_worker(coord)
    run_worker(fast)
    assert coord.wait(15.0), coord.admin_status()
    frames = coord.collect_frames()
    assert len(frames) == 20


def test_duplicate_results_deduped(coord):
    coord.set_scene(RenderConfig(), "cornell")
    w = make_worker(coord)
    run_worker(w)
    time.sleep(0.3)
    coord.start_render(total_frames=10, job_batch=10)
    assert coord.wait(10.0)
    # inject a duplicate result directly
    frames = [EncodedFrame(0, 0, True, b"dup")]
    meta, blob = P.pack_frames(frames)
    with coord._lock:
        ws = list(coord._workers.values())[0]
    coord._handle(ws, P.Message(P.RENDER_RESULT,
                                {"start": 0, "frames": meta}, blob))
    out = coord.collect_frames()
    assert out[0].data == b"frame-0"  # original kept, duplicate ignored


def test_late_join_gets_scene(coord):
    coord.set_scene(RenderConfig(), "cornell")
    time.sleep(0.1)
    w = make_worker(coord)  # joins after scene was set
    run_worker(w)
    deadline = time.time() + 5
    while time.time() < deadline:
        st = coord.admin_status()
        if st["workers"] and st["workers"][0]["has_scene"]:
            break
        time.sleep(0.05)
    assert coord.admin_status()["workers"][0]["has_scene"]


def test_session_resumption(coord):
    coord.set_scene(RenderConfig(), "cornell")
    w = make_worker(coord)
    run_worker(w)
    time.sleep(0.3)
    sid = w.session
    w.close()
    time.sleep(0.2)
    # reconnect with the same session: same worker identity reclaimed
    w2 = make_worker(coord, session=sid)
    run_worker(w2)
    time.sleep(0.3)
    assert w2.worker_id == w.worker_id
    assert len(coord.admin_status()["workers"]) == 1


def test_admin_status_and_log(coord):
    coord.set_scene(RenderConfig(), "cornell")
    w = make_worker(coord)
    run_worker(w)
    time.sleep(0.3)
    st = coord.admin_status()
    assert "log" in st and len(st["log"]) >= 1
    assert st["workers"][0]["status"] in ("idle", "loading")


def test_frame_pack_roundtrip():
    frames = [EncodedFrame(i, i * 1000, i == 0, bytes([i] * (i + 1)))
              for i in range(5)]
    meta, blob = P.pack_frames(frames)
    out = P.unpack_frames(meta, blob)
    for a, b in zip(frames, out):
        assert a == b


def test_http_admin_console(coord):
    """HTTP admin endpoint: status JSON, basic auth, kick (server.ts:41-113)."""
    import json
    import urllib.request
    import urllib.error

    port = coord.start_admin(password="pw")
    coord.set_scene(RenderConfig(), "cornell")
    w = make_worker(coord)
    run_worker(w)
    time.sleep(0.3)

    url = f"http://127.0.0.1:{port}/admin/api/status"
    # unauthenticated -> 401
    try:
        urllib.request.urlopen(url, timeout=5)
        assert False, "expected 401"
    except urllib.error.HTTPError as e:
        assert e.code == 401

    import base64
    req = urllib.request.Request(url)
    req.add_header("Authorization",
                   "Basic " + base64.b64encode(b"admin:pw").decode())
    with urllib.request.urlopen(req, timeout=5) as resp:
        st = json.loads(resp.read())
    assert len(st["workers"]) == 1
    wid = st["workers"][0]["id"]

    kick = urllib.request.Request(
        f"http://127.0.0.1:{port}/admin/api/kick?id={wid}", method="POST")
    kick.add_header("Authorization",
                    "Basic " + base64.b64encode(b"admin:pw").decode())
    with urllib.request.urlopen(kick, timeout=5) as resp:
        assert json.loads(resp.read())["kicked"] == wid


def test_http_admin_page(coord):
    """GET /admin serves the HTML console (reference admin.html)."""
    import base64
    import urllib.request

    port = coord.start_admin(password="pw")
    req = urllib.request.Request(f"http://127.0.0.1:{port}/admin")
    req.add_header("Authorization",
                   "Basic " + base64.b64encode(b"admin:pw").decode())
    with urllib.request.urlopen(req, timeout=5) as resp:
        assert resp.headers["Content-Type"].startswith("text/html")
        body = resp.read().decode()
    assert "/admin/api/status" in body and "kick" in body


def test_slow_reader_does_not_block_fsm():
    """A worker that stops reading (congested link) must not stall the
    coordinator: scene broadcast and admin status return immediately (the
    multi-MB payload drains on the worker's sender thread, not under the
    FSM lock), a healthy worker completes the render meanwhile, and the
    stuck worker trips the send timeout and goes lost (the reference
    explicitly backpressures its bulk path, RtcClient.ts:201-232)."""
    import socket

    c = Coordinator(secret="s3cret", grace_period_s=0.5, send_timeout_s=1.5)
    try:
        # Raw protocol-speaking socket with a tiny receive buffer that
        # handshakes and then never reads again.
        s = socket.socket()
        s.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 4096)
        s.connect(("127.0.0.1", c.port))
        P.send_message(s, P.Message(P.HELLO, {"token": "s3cret",
                                              "has_scene": False}))
        assert P.recv_message(s).type == P.WELCOME

        payload = bytes(64 << 20)  # 64 MB scene: cannot fit kernel buffers
        t0 = time.perf_counter()
        c.set_scene(RenderConfig(), "cornell", payload=payload)
        assert time.perf_counter() - t0 < 0.5  # enqueue only, no write
        t0 = time.perf_counter()
        c.admin_status()
        assert time.perf_counter() - t0 < 0.5

        # A healthy worker joins and completes the whole render while the
        # slow one is still wedged in its sender thread.
        w = make_worker(c)
        run_worker(w)
        time.sleep(0.3)
        c.start_render(total_frames=8, job_batch=4)
        assert c.wait(15.0), c.admin_status()
        assert len(c.collect_frames()) == 8

        # The wedged connection times out and is marked lost.
        deadline = time.time() + 10
        while time.time() < deadline:
            st = c.admin_status()["workers"]
            slow = [x for x in st if x["id"] != w.worker_id]
            if slow and slow[0]["status"] == "lost":
                break
            time.sleep(0.1)
        else:
            raise AssertionError(c.admin_status())
        s.close()
    finally:
        c.close()


def test_farm_end_to_end_with_real_renderer():
    """Full-stack farm: Coordinator + WorkerClient with the REAL Renderer
    (_default_renderer_factory) and VideoRecorder at 16x16/spp 1/depth 2,
    2 workers, 4 frames. The collected PNGs must decode and match a solo
    record_chunks run byte-for-byte (per-frame accumulation reset + the
    deterministic counter RNG make frames independent of job splitting)."""
    import io
    from PIL import Image

    from webgpu_raytracer_tpu.parallel.cluster import _default_renderer_factory
    from webgpu_raytracer_tpu.render.recorder import VideoRecorder

    config = RenderConfig(width=16, height=16, max_depth=2, shader_spp=1,
                          spp=1, fps=4, duration=1.0)

    # Solo reference run (also warms the process-wide jit cache).
    solo = VideoRecorder(_default_renderer_factory(
        config, "cornell", None, b"")).record_chunks(config, 0, 4)
    assert len(solo) == 4

    c = Coordinator(secret="s3cret", grace_period_s=0.5)
    try:
        c.set_scene(config, "cornell")
        workers = [WorkerClient("127.0.0.1", c.port, secret="s3cret")
                   for _ in range(2)]
        threads = [run_worker(w) for w in workers]
        c.start_render(total_frames=4, job_batch=2)
        assert c.wait(300.0), c.admin_status()
        frames = c.collect_frames()
        assert [f.frame_index for f in frames] == [0, 1, 2, 3]
        for f, ref in zip(frames, solo):
            img = np.asarray(Image.open(io.BytesIO(f.data)))
            assert img.shape == (16, 16, 3)
            assert f.data == ref.data, f.frame_index
        for w in workers:
            w.close()
    finally:
        c.close()
