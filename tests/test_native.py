"""Unit tests for the native scene compiler (BVH invariants, loaders, camera).

The reference ships no tests (SURVEY.md §4); these implement the test pyramid
it implies: leaf coverage, skip-pointer reachability, AABB containment,
loader round-trips, and the exact flat-buffer contracts of SURVEY.md §2.2.
"""

import math

import numpy as np
import pytest

from webgpu_raytracer_tpu.models.native import NativeWorld

PRESETS = ["cornell", "spheres", "mixed", "special", "mesh", "viewer"]


def bvh_segments(blas_flat):
    """Split the merged BLAS buffer into per-geometry segments via root skips."""
    nodes = blas_flat.reshape(-1, 8)
    skip = nodes[:, 3].copy().view(np.uint32)
    segs = []
    start = 0
    while start < len(nodes):
        count = int(skip[start])
        assert count > 0, "corrupt root skip"
        segs.append((start, count))
        start += count
    return segs


@pytest.fixture(scope="module", params=["cornell", "special", "mesh", "viewer"])
def world(request):
    return NativeWorld(request.param)


def test_leaf_coverage_and_count_bits(world):
    """Every triangle is in exactly one leaf; leaf counts fit 3 bits (<=4)."""
    blas = world.blas().reshape(-1, 8)
    topo = world.topology().reshape(-1, 20)
    data = blas[:, 7].copy().view(np.uint32)
    covered = np.zeros(topo.shape[0], np.int32)
    for d in data[data != 0]:
        first, count = d >> 3, d & 7
        assert 1 <= count <= 4
        covered[first : first + count] += 1
    assert (covered == 1).all()


def test_skip_pointer_reachability(world):
    """The stackless walk (hit-all policy) visits every node exactly once."""
    blas = world.blas().reshape(-1, 8)
    skip = blas[:, 3].copy().view(np.uint32)
    data = blas[:, 7].copy().view(np.uint32)
    for start, count in bvh_segments(world.blas()):
        visited = np.zeros(count, np.int32)
        cur = 0
        end = count
        steps = 0
        while cur < end:
            visited[cur] += 1
            # Visiting everything = take curr+1 on internal, skip on leaf.
            cur = cur + 1 if data[start + cur] == 0 else int(skip[start + cur])
            steps += 1
            assert steps <= count + 1
        assert (visited == 1).all()


def test_aabb_containment(world):
    """Child AABBs are contained in their parent (skip-walk structure)."""
    blas = world.blas().reshape(-1, 8)
    data = blas[:, 7].copy().view(np.uint32)
    skip = blas[:, 3].copy().view(np.uint32)
    eps = 1e-4
    for start, count in bvh_segments(world.blas()):
        # Recover children: internal node at i has children at i+1 and at the
        # first child's skip pointer.
        for i in range(count):
            if data[start + i] != 0:
                continue
            c1 = i + 1
            c2 = int(skip[start + c1])
            for c in (c1, c2):
                assert c < count
                assert (blas[start + c, 0:3] >= blas[start + i, 0:3] - eps).all()
                assert (blas[start + c, 4:7] <= blas[start + i, 4:7] + eps).all()


def test_leaf_triangles_inside_leaf_aabb(world):
    blas = world.blas().reshape(-1, 8)
    topo = world.topology().reshape(-1, 20)
    pos = world.vertices().reshape(-1, 4)[:, :3]
    data = blas[:, 7].copy().view(np.uint32)
    eps = 1e-3
    for i in np.nonzero(data != 0)[0]:
        first, count = data[i] >> 3, data[i] & 7
        for t in range(first, first + count):
            for k in range(3):
                v = pos[topo[t, k]]
                assert (v >= blas[i, 0:3] - eps).all()
                assert (v <= blas[i, 4:7] + eps).all()


def test_all_presets_build():
    for name in PRESETS:
        w = NativeWorld(name)
        assert w.topology().size % 20 == 0
        assert w.topology().size > 0
        assert w.instances().size % 36 == 0
        n_inst = w.instances().size // 36
        assert w.tlas().size // 8 == 2 * n_inst - 1  # median-split, 1 inst/leaf
        assert w.draw_commands().size == 4 * n_inst


def test_cornell_counts():
    w = NativeWorld("cornell")
    # 5 walls + light = 6 quads = 12 tris; 2 boxes = 24 tris
    assert w.topology().size // 20 == 36
    assert w.lights().size // 2 == 2  # the two light-quad triangles
    assert w.vertices().size // 4 == 72


def test_camera_buffer_math():
    """Verify the 24-float camera block against direct RTiOW math."""
    w = NativeWorld("cornell")
    w.update_camera(640, 480)
    cam = w.camera()
    lookfrom = np.array([0.0, 1.0, -2.4])
    lookat = np.array([0.0, 1.0, 0.0])
    vup = np.array([0.0, 1.0, 0.0])
    vfov, focus = 60.0, 2.4
    aspect = 640 / 480
    h = math.tan(math.radians(vfov) / 2)
    vh = 2 * h * focus
    vw = vh * aspect
    wv = (lookfrom - lookat) / np.linalg.norm(lookfrom - lookat)
    u = np.cross(vup, wv)
    u = u / np.linalg.norm(u)
    v = np.cross(wv, u)
    horizontal = u * vw
    vertical = v * vh
    lower_left = lookfrom - horizontal / 2 - vertical / 2 - wv * focus
    np.testing.assert_allclose(cam[0:3], lookfrom, atol=1e-5)
    assert cam[3] == 0.0  # lens radius
    np.testing.assert_allclose(cam[4:7], lower_left, atol=1e-5)
    np.testing.assert_allclose(cam[8:11], horizontal, atol=1e-5)
    np.testing.assert_allclose(cam[12:15], vertical, atol=1e-5)


def test_obj_parser_roundtrip():
    obj = """
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
vt 0 0
vt 1 0
vt 0 1
vn 0 0 1
f 1/1/1 2/2/1 4/3/1 3/1/1
"""
    w = NativeWorld("viewer", obj_source=obj)
    # env (540 tris incl light sphere? viewer env = 6 quads = 12 tris + model)
    topo = w.topology().reshape(-1, 20)
    model_tris = (topo[:, 3] == 1).sum()
    assert model_tris == 2  # quad fan-triangulated


def test_lights_reference_emissive_tris():
    w = NativeWorld("cornell")
    topo = w.topology().reshape(-1, 20)
    lights = w.lights().reshape(-1, 2)
    attrs = topo[:, 4:20].copy().view(np.float32)
    for inst_i, tri_i in lights:
        assert abs(attrs[tri_i, 3] - 3.0) < 1e-6  # mat_type LIGHT
    # every emissive tri is listed
    assert (np.abs(attrs[:, 3] - 3.0) < 1e-6).sum() == lights.shape[0]


def test_instance_inverse():
    w = NativeWorld("viewer")
    inst = w.instances().reshape(-1, 36)
    for row in inst:
        tf = row[0:16].reshape(4, 4).T
        inv = row[16:32].reshape(4, 4).T
        np.testing.assert_allclose(tf @ inv, np.eye(4), atol=1e-4)


def test_update_is_stable():
    """Static scene: update(t) must reproduce identical buffers."""
    w = NativeWorld("cornell")
    a = w.topology().copy()
    b = w.blas().copy()
    w.update(1.0)
    np.testing.assert_array_equal(w.topology(), a)
    np.testing.assert_array_equal(w.blas(), b)


def test_async_world_bridge():
    """WorldBridge runs updates off-thread (world-bridge.ts analogue)."""
    from webgpu_raytracer_tpu.models.bridge import WorldBridge

    b = WorldBridge("cornell")
    fut = b.update_async(0.5)
    assert b.wait(10.0)
    assert fut.done() and fut.result()
    assert b.topology().size > 0  # passthrough to the native world
    # sync wrapper
    b.update(1.0)
    # double-kick guard
    import pytest as _pytest
    slow = b.update_async(2.0)
    if not slow.done():
        with _pytest.raises(RuntimeError):
            b.update_async(3.0)
    b.wait()


def test_reference_bundled_asset_loads():
    """Bytes this repo did not author: the reference's bundled diamond.obj
    (the asset its UI loads by default, UIManager.ts:91) parsed from disk
    at test time — never copied into this repo. No glTF exporter toolchain
    (pygltflib / trimesh / Blender) exists in this environment, so this is
    the only externally-authored asset available; the exporter-quirks GLB
    fixtures (tests/glb_fixture.py) remain the loader's robustness net."""
    import os

    path = "/root/reference/public/diamond.obj"
    if not os.path.exists(path):
        import pytest
        pytest.skip("reference checkout not present")
    with open(path) as f:
        src = f.read()
    w = NativeWorld("viewer", obj_source=src)
    w.update_camera(64, 64)
    # 8-triangle octahedron + 12 env tris, all finite, valid BLAS
    topo = w.topology().reshape(-1, 20)
    assert topo.shape[0] == 20
    v = np.asarray(w.vertices(), np.float32)
    assert np.isfinite(v).all()
    assert w.blas().size > 0
