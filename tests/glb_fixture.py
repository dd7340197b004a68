"""Programmatic GLB fixtures for loader tests (no external assets)."""

import json
import struct

import numpy as np


def _pad4(b: bytes, pad: bytes = b"\x00") -> bytes:
    return b + pad * ((4 - len(b) % 4) % 4)


def build_glb(doc: dict, bin_data: bytes) -> bytes:
    js = _pad4(json.dumps(doc).encode(), b" ")
    bin_data = _pad4(bin_data)
    total = 12 + 8 + len(js) + 8 + len(bin_data)
    out = struct.pack("<III", 0x46546C67, 2, total)
    out += struct.pack("<II", len(js), 0x4E4F534A) + js
    out += struct.pack("<II", len(bin_data), 0x004E4942) + bin_data
    return out


def simple_quad_glb(animated: bool = True) -> bytes:
    """A red unit quad + (optionally) a rotation animation on its node."""
    positions = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    normals = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    indices = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    times = np.array([0.0, 1.0], np.float32)
    # 180-degree Y rotation over 1s
    rots = np.array([[0, 0, 0, 1], [0, 1, 0, 0]], np.float32)

    blobs = [positions.tobytes(), normals.tobytes(), uvs.tobytes(),
             indices.tobytes(), times.tobytes(), rots.tobytes()]
    offsets = []
    off = 0
    for b in blobs:
        offsets.append(off)
        off += len(b) + ((4 - len(b) % 4) % 4)
    bin_data = b"".join(b + b"\x00" * ((4 - len(b) % 4) % 4) for b in blobs)

    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"name": "quad", "mesh": 0,
                   "translation": [0.0, 1.0, 0.0]}],
        "buffers": [{"byteLength": len(bin_data)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": offsets[0], "byteLength": 48},
            {"buffer": 0, "byteOffset": offsets[1], "byteLength": 48},
            {"buffer": 0, "byteOffset": offsets[2], "byteLength": 32},
            {"buffer": 0, "byteOffset": offsets[3], "byteLength": 12},
            {"buffer": 0, "byteOffset": offsets[4], "byteLength": 8},
            {"buffer": 0, "byteOffset": offsets[5], "byteLength": 32},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 4, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 6, "type": "SCALAR"},
            {"bufferView": 4, "componentType": 5126, "count": 2, "type": "SCALAR"},
            {"bufferView": 5, "componentType": 5126, "count": 2, "type": "VEC4"},
        ],
        "materials": [{
            "pbrMetallicRoughness": {
                "baseColorFactor": [0.8, 0.1, 0.1, 1.0],
                "metallicFactor": 0.0,
                "roughnessFactor": 0.9,
            },
        }],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3,
            "material": 0,
        }]}],
    }
    if animated:
        doc["animations"] = [{
            "name": "spin",
            "channels": [{"sampler": 0,
                          "target": {"node": 0, "path": "rotation"}}],
            "samplers": [{"input": 4, "output": 5,
                          "interpolation": "LINEAR"}],
        }]
    return build_glb(doc, bin_data)


def two_clip_skinned_glb() -> bytes:
    """The skinned strip with TWO animation clips driving joint1: 'sway'
    (+x translate) and 'lift' (+y translate) — exercises animation-clip
    selection (set_animation; reference lib.rs active_anim_index + UIManager
    anim select). Only skinned geometry observably responds to node
    animation (the reference hard-codes non-env instance transforms,
    lib.rs:196-204)."""
    positions = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    joints = np.array(
        [[0, 0, 0, 0], [0, 0, 0, 0], [1, 0, 0, 0], [1, 0, 0, 0]], np.uint16)
    weights = np.array(
        [[1, 0, 0, 0], [1, 0, 0, 0], [1, 0, 0, 0], [1, 0, 0, 0]], np.float32)
    indices = np.array([0, 1, 3, 0, 3, 2], np.uint16)
    ibm = np.stack([np.eye(4, dtype=np.float32),
                    np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0],
                              [0, -1, 0, 1]], np.float32)])
    times = np.array([0.0, 1.0], np.float32)
    sway = np.array([[0, 1, 0], [1, 1, 0]], np.float32)   # joint1 moves +x
    lift = np.array([[0, 1, 0], [0, 2, 0]], np.float32)   # joint1 moves +y

    blobs = [positions.tobytes(), joints.tobytes(), weights.tobytes(),
             indices.tobytes(), ibm.tobytes(), times.tobytes(),
             sway.tobytes(), lift.tobytes()]
    offsets = []
    off = 0
    for b in blobs:
        offsets.append(off)
        off += len(b) + ((4 - len(b) % 4) % 4)
    bin_data = b"".join(b + b"\x00" * ((4 - len(b) % 4) % 4) for b in blobs)

    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [
            {"name": "root_joint", "children": [2]},
            {"name": "mesh_node", "mesh": 0, "skin": 0},
            {"name": "tip_joint", "translation": [0, 1, 0]},
        ],
        "buffers": [{"byteLength": len(bin_data)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": offsets[0], "byteLength": 48},
            {"buffer": 0, "byteOffset": offsets[1], "byteLength": 32},
            {"buffer": 0, "byteOffset": offsets[2], "byteLength": 64},
            {"buffer": 0, "byteOffset": offsets[3], "byteLength": 12},
            {"buffer": 0, "byteOffset": offsets[4], "byteLength": 128},
            {"buffer": 0, "byteOffset": offsets[5], "byteLength": 8},
            {"buffer": 0, "byteOffset": offsets[6], "byteLength": 24},
            {"buffer": 0, "byteOffset": offsets[7], "byteLength": 24},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 4, "type": "VEC4"},
            {"bufferView": 2, "componentType": 5126, "count": 4, "type": "VEC4"},
            {"bufferView": 3, "componentType": 5123, "count": 6, "type": "SCALAR"},
            {"bufferView": 4, "componentType": 5126, "count": 2, "type": "MAT4"},
            {"bufferView": 5, "componentType": 5126, "count": 2, "type": "SCALAR"},
            {"bufferView": 6, "componentType": 5126, "count": 2, "type": "VEC3"},
            {"bufferView": 7, "componentType": 5126, "count": 2, "type": "VEC3"},
        ],
        "skins": [{"joints": [0, 2], "inverseBindMatrices": 4}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "JOINTS_0": 1, "WEIGHTS_0": 2},
            "indices": 3,
        }]}],
        "animations": [
            {"name": "sway",
             "channels": [{"sampler": 0,
                           "target": {"node": 2, "path": "translation"}}],
             "samplers": [{"input": 5, "output": 6,
                           "interpolation": "LINEAR"}]},
            {"name": "lift",
             "channels": [{"sampler": 0,
                           "target": {"node": 2, "path": "translation"}}],
             "samplers": [{"input": 5, "output": 7,
                           "interpolation": "LINEAR"}]},
        ],
    }
    return build_glb(doc, bin_data)


def skinned_strip_glb() -> bytes:
    """A 2-bone skinned vertical strip: bottom bound to joint0 (root),
    top bound to joint1 which the animation rotates."""
    # 4 verts: two at y=0 (joint 0), two at y=1 (joint 1)
    positions = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    joints = np.array(
        [[0, 0, 0, 0], [0, 0, 0, 0], [1, 0, 0, 0], [1, 0, 0, 0]], np.uint16)
    weights = np.array(
        [[1, 0, 0, 0], [1, 0, 0, 0], [1, 0, 0, 0], [1, 0, 0, 0]], np.float32)
    indices = np.array([0, 1, 3, 0, 3, 2], np.uint16)
    # inverse bind: joint0 identity; joint1 translate(0,-1,0) (joint at y=1)
    ibm = np.stack([np.eye(4, dtype=np.float32),
                    np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0],
                              [0, -1, 0, 1]], np.float32)])  # column-major
    times = np.array([0.0, 1.0], np.float32)
    trans = np.array([[0, 1, 0], [1, 1, 0]], np.float32)  # joint1 moves +x

    blobs = [positions.tobytes(), joints.tobytes(), weights.tobytes(),
             indices.tobytes(), ibm.tobytes(), times.tobytes(),
             trans.tobytes()]
    offsets = []
    off = 0
    for b in blobs:
        offsets.append(off)
        off += len(b) + ((4 - len(b) % 4) % 4)
    bin_data = b"".join(b + b"\x00" * ((4 - len(b) % 4) % 4) for b in blobs)

    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [
            {"name": "root_joint", "children": [2]},
            {"name": "mesh_node", "mesh": 0, "skin": 0},
            {"name": "tip_joint", "translation": [0, 1, 0]},
        ],
        "buffers": [{"byteLength": len(bin_data)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": offsets[0], "byteLength": 48},
            {"buffer": 0, "byteOffset": offsets[1], "byteLength": 32},
            {"buffer": 0, "byteOffset": offsets[2], "byteLength": 64},
            {"buffer": 0, "byteOffset": offsets[3], "byteLength": 12},
            {"buffer": 0, "byteOffset": offsets[4], "byteLength": 128},
            {"buffer": 0, "byteOffset": offsets[5], "byteLength": 8},
            {"buffer": 0, "byteOffset": offsets[6], "byteLength": 24},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 4, "type": "VEC4"},
            {"bufferView": 2, "componentType": 5126, "count": 4, "type": "VEC4"},
            {"bufferView": 3, "componentType": 5123, "count": 6, "type": "SCALAR"},
            {"bufferView": 4, "componentType": 5126, "count": 2, "type": "MAT4"},
            {"bufferView": 5, "componentType": 5126, "count": 2, "type": "SCALAR"},
            {"bufferView": 6, "componentType": 5126, "count": 2, "type": "VEC3"},
        ],
        "skins": [{"joints": [0, 2], "inverseBindMatrices": 4}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "JOINTS_0": 1, "WEIGHTS_0": 2},
            "indices": 3,
        }]}],
        "animations": [{
            "name": "sway",
            "channels": [{"sampler": 0,
                          "target": {"node": 2, "path": "translation"}}],
            "samplers": [{"input": 5, "output": 6,
                          "interpolation": "LINEAR"}],
        }],
    }
    return build_glb(doc, bin_data)


def _uv_sphere(segments: int, rings: int, radius: float):
    """UV sphere (positions, normals, uvs, indices): 2*segments*(rings-1)
    triangles."""
    verts, norms, uvs = [], [], []
    for r in range(rings + 1):
        phi = np.pi * r / rings
        for s in range(segments + 1):
            theta = 2 * np.pi * s / segments
            n = np.array([np.sin(phi) * np.cos(theta), np.cos(phi),
                          np.sin(phi) * np.sin(theta)], np.float32)
            verts.append(n * radius)
            norms.append(n)
            uvs.append([s / segments, r / rings])
    idx = []
    stride = segments + 1
    for r in range(rings):
        for s in range(segments):
            a = r * stride + s
            b = a + stride
            if r > 0:
                idx += [a, b, a + 1]
            if r < rings - 1:
                idx += [a + 1, b, b + 1]
    return (np.asarray(verts, np.float32), np.asarray(norms, np.float32),
            np.asarray(uvs, np.float32), np.asarray(idx, np.uint16))


def character_glb() -> bytes:
    """A real-asset-SCALE model (the bundled-model analogue of the
    reference's public/diamond.obj + UI .glb path, UIManager.ts:91): a
    'snowman' with a node hierarchy (body -> head child), THREE mesh
    primitives across TWO meshes with distinct materials (textured
    lambertian body, metallic head, emissive collar), TWO embedded PNG
    textures, >1k triangles, and TWO animation clips ('bob' translation,
    'spin' rotation). Exercises every loader subsystem a real-world GLB
    hits except skinning (covered by skinned_strip_glb)."""
    import io
    from PIL import Image

    def png_bytes(arr):
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return buf.getvalue()

    checker = np.zeros((16, 16, 3), np.uint8)
    checker[::2, ::2] = checker[1::2, 1::2] = [200, 160, 40]
    checker[::2, 1::2] = checker[1::2, ::2] = [40, 80, 200]
    stripes = np.zeros((8, 8, 3), np.uint8)
    stripes[:, :] = [220, 220, 220]
    stripes[::2, :] = [180, 30, 30]
    png_a, png_b = png_bytes(checker), png_bytes(stripes)

    bp, bn, buv, bi = _uv_sphere(32, 17, 1.0)       # body: 1024 tris
    hp, hn, huv, hi = _uv_sphere(16, 9, 0.5)        # head: 256 tris
    cp = np.array([[-0.6, 0, -0.6], [0.6, 0, -0.6],
                   [0.6, 0, 0.6], [-0.6, 0, 0.6]], np.float32)  # collar quad
    cn = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    cuv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    ci = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    times = np.array([0.0, 1.0], np.float32)
    bob = np.array([[0, 1.0, 0], [0, 1.4, 0]], np.float32)
    spin = np.array([[0, 0, 0, 1], [0, 1, 0, 0]], np.float32)

    blobs = [a.tobytes() for a in
             (bp, bn, buv, bi, hp, hn, huv, hi, cp, cn, cuv, ci,
              times, bob, spin)] + [png_a, png_b]
    offsets = []
    off = 0
    for b in blobs:
        offsets.append(off)
        off += len(b) + ((4 - len(b) % 4) % 4)
    bin_data = b"".join(b + b"\x00" * ((4 - len(b) % 4) % 4) for b in blobs)

    def view(k):
        return {"buffer": 0, "byteOffset": offsets[k],
                "byteLength": len(blobs[k])}

    def acc(k, ctype, count, atype):
        return {"bufferView": k, "componentType": ctype, "count": count,
                "type": atype}

    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 2]}],
        "nodes": [
            {"name": "body", "mesh": 0, "translation": [0.0, 1.0, 0.0],
             "children": [1]},
            {"name": "head", "mesh": 1, "translation": [0.0, 1.2, 0.0]},
            {"name": "anchor"},
        ],
        "buffers": [{"byteLength": len(bin_data)}],
        "bufferViews": [view(k) for k in range(len(blobs))],
        "accessors": [
            acc(0, 5126, len(bp), "VEC3"), acc(1, 5126, len(bn), "VEC3"),
            acc(2, 5126, len(buv), "VEC2"), acc(3, 5123, len(bi), "SCALAR"),
            acc(4, 5126, len(hp), "VEC3"), acc(5, 5126, len(hn), "VEC3"),
            acc(6, 5126, len(huv), "VEC2"), acc(7, 5123, len(hi), "SCALAR"),
            acc(8, 5126, 4, "VEC3"), acc(9, 5126, 4, "VEC3"),
            acc(10, 5126, 4, "VEC2"), acc(11, 5123, 6, "SCALAR"),
            acc(12, 5126, 2, "SCALAR"), acc(13, 5126, 2, "VEC3"),
            acc(14, 5126, 2, "VEC4"),
        ],
        "images": [{"bufferView": 15, "mimeType": "image/png"},
                   {"bufferView": 16, "mimeType": "image/png"}],
        "textures": [{"source": 0}, {"source": 1}],
        "materials": [
            {"pbrMetallicRoughness": {
                "baseColorFactor": [1, 1, 1, 1],
                "baseColorTexture": {"index": 0},
                "metallicFactor": 0.0, "roughnessFactor": 0.8}},
            {"pbrMetallicRoughness": {
                "baseColorFactor": [0.9, 0.9, 0.95, 1],
                "metallicFactor": 1.0, "roughnessFactor": 0.15}},
            {"pbrMetallicRoughness": {
                "baseColorFactor": [1, 1, 1, 1],
                "baseColorTexture": {"index": 1},
                "metallicFactor": 0.0},
             "emissiveFactor": [0.4, 0.3, 0.1]},
        ],
        "meshes": [
            {"primitives": [
                {"attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
                 "indices": 3, "material": 0},
                {"attributes": {"POSITION": 8, "NORMAL": 9, "TEXCOORD_0": 10},
                 "indices": 11, "material": 2},
            ]},
            {"primitives": [
                {"attributes": {"POSITION": 4, "NORMAL": 5, "TEXCOORD_0": 6},
                 "indices": 7, "material": 1},
            ]},
        ],
        "animations": [
            {"name": "bob",
             "channels": [{"sampler": 0,
                           "target": {"node": 0, "path": "translation"}}],
             "samplers": [{"input": 12, "output": 13,
                           "interpolation": "LINEAR"}]},
            {"name": "spin",
             "channels": [{"sampler": 0,
                           "target": {"node": 0, "path": "rotation"}}],
             "samplers": [{"input": 12, "output": 14,
                           "interpolation": "LINEAR"}]},
        ],
    }
    return build_glb(doc, bin_data)


def textured_quad_glb() -> bytes:
    """A quad with an embedded PNG baseColorTexture: left half red, right
    half blue (tests decode -> texture array -> bilinear sampling)."""
    import io
    from PIL import Image

    img = np.zeros((8, 8, 3), np.uint8)
    img[:, :4] = [255, 0, 0]
    img[:, 4:] = [0, 0, 255]
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    png = buf.getvalue()

    positions = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    normals = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    indices = np.array([0, 1, 2, 0, 2, 3], np.uint16)

    blobs = [positions.tobytes(), normals.tobytes(), uvs.tobytes(),
             indices.tobytes(), png]
    offsets = []
    off = 0
    for b in blobs:
        offsets.append(off)
        off += len(b) + ((4 - len(b) % 4) % 4)
    bin_data = b"".join(b + b"\x00" * ((4 - len(b) % 4) % 4) for b in blobs)

    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [0.0, 1.0, 0.0]}],
        "buffers": [{"byteLength": len(bin_data)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": offsets[0], "byteLength": 48},
            {"buffer": 0, "byteOffset": offsets[1], "byteLength": 48},
            {"buffer": 0, "byteOffset": offsets[2], "byteLength": 32},
            {"buffer": 0, "byteOffset": offsets[3], "byteLength": 12},
            {"buffer": 0, "byteOffset": offsets[4], "byteLength": len(png)},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 4, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 6, "type": "SCALAR"},
        ],
        "images": [{"bufferView": 4, "mimeType": "image/png"}],
        "textures": [{"source": 0}],
        "materials": [{
            "pbrMetallicRoughness": {
                "baseColorFactor": [1.0, 1.0, 1.0, 1.0],
                "baseColorTexture": {"index": 0},
                "metallicFactor": 0.0,
            },
        }],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3,
            "material": 0,
        }]}],
    }
    return build_glb(doc, bin_data)


def exporter_quirks_glb() -> bytes:
    """A GLB shaped like real exporter output (Blender/VRM toolchains),
    exercising the loader paths a hand-tuned fixture never hits:

    - prim 0: ONE interleaved vertex bufferView (pos+normal+uv, stride 32 —
      Blender's layout) with extra TANGENT and COLOR_0 (normalized u8)
      attributes that must be ignored
    - prim 1: NON-INDEXED triangle list with NO NORMAL (spec: implementations
      must compute normals)
    - prim 2: TRIANGLE_STRIP (mode 5)
    - prim 3: SPARSE position accessor substituting one vertex
    - prim 4: LINES (mode 1) — must be skipped entirely
    - image embedded as a base64 data: URI (not a bufferView)
    """
    import base64
    import io

    from PIL import Image

    img = np.zeros((8, 8, 3), np.uint8)
    img[:, :, 0] = 255  # solid red
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    data_uri = ("data:image/png;base64,"
                + base64.b64encode(buf.getvalue()).decode())

    # prim 0: interleaved quad at z=0 (pos 12B + normal 12B + uv 8B = 32B)
    inter = np.zeros((4, 8), np.float32)
    inter[:, 0:3] = [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]]
    inter[:, 3:6] = [0, 0, 1]
    inter[:, 6:8] = [[0, 0], [1, 0], [1, 1], [0, 1]]
    idx0 = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    tangents = np.tile(np.array([[1, 0, 0, 1]], np.float32), (4, 1))
    colors = np.full((4, 4), 255, np.uint8)  # COLOR_0 normalized u8

    # prim 1: two non-indexed triangles (z=1 plane), no NORMAL
    tri1 = np.array([[0, 0, 1], [1, 0, 1], [1, 1, 1],
                     [0, 0, 1], [1, 1, 1], [0, 1, 1]], np.float32)

    # prim 2: strip of 4 verts -> 2 triangles (z=2 plane)
    strip = np.array([[0, 0, 2], [0, 1, 2], [1, 0, 2], [1, 1, 2]], np.float32)
    strip_n = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    idx2 = np.array([0, 1, 2, 3], np.uint16)

    # prim 3: base triangle DEGENERATE (v2 duplicates v1); sparse replaces
    # vertex 2 with (0.5, 1, 3) making an isoceles triangle whose edge-length
    # RATIOS survive the viewer preset's uniform normalize+demo transform.
    sparse_base = np.array([[0, 0, 3], [1, 0, 3], [1, 0, 3]], np.float32)
    sparse_n = np.tile(np.array([[0, 0, 1]], np.float32), (3, 1))
    sparse_idx = np.array([2], np.uint16)
    sparse_val = np.array([[0.5, 1, 3]], np.float32)
    idx3 = np.array([0, 1, 2], np.uint16)

    # prim 4: LINES — 2 verts
    lines = np.array([[0, 0, 4], [1, 1, 4]], np.float32)
    idx4 = np.array([0, 1], np.uint16)

    blobs = [inter.tobytes(), idx0.tobytes(), tangents.tobytes(),
             colors.tobytes(), tri1.tobytes(), strip.tobytes(),
             strip_n.tobytes(), idx2.tobytes(), sparse_base.tobytes(),
             sparse_n.tobytes(), sparse_idx.tobytes(), sparse_val.tobytes(),
             idx3.tobytes(), lines.tobytes(), idx4.tobytes()]
    offsets = []
    off = 0
    for b in blobs:
        offsets.append(off)
        off += len(b) + ((4 - len(b) % 4) % 4)
    bin_data = b"".join(b + b"\x00" * ((4 - len(b) % 4) % 4) for b in blobs)

    def view(k, stride=None):
        v = {"buffer": 0, "byteOffset": offsets[k], "byteLength": len(blobs[k])}
        if stride:
            v["byteStride"] = stride
        return v

    doc = {
        "asset": {"version": "2.0", "generator": "exporter-quirks"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"name": "quirks", "mesh": 0}],
        "buffers": [{"byteLength": len(bin_data)}],
        "bufferViews": [
            view(0, stride=32), view(1), view(2), view(3), view(4),
            view(5), view(6), view(7), view(8), view(9), view(10),
            view(11), view(12), view(13), view(14),
        ],
        "accessors": [
            # 0-2: interleaved POSITION/NORMAL/TEXCOORD_0 into ONE view
            {"bufferView": 0, "byteOffset": 0, "componentType": 5126,
             "count": 4, "type": "VEC3"},
            {"bufferView": 0, "byteOffset": 12, "componentType": 5126,
             "count": 4, "type": "VEC3"},
            {"bufferView": 0, "byteOffset": 24, "componentType": 5126,
             "count": 4, "type": "VEC2"},
            # 3: indices, 4: TANGENT, 5: COLOR_0 (normalized u8)
            {"bufferView": 1, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
            {"bufferView": 2, "componentType": 5126, "count": 4,
             "type": "VEC4"},
            {"bufferView": 3, "componentType": 5121, "count": 4,
             "type": "VEC4", "normalized": True},
            # 6: non-indexed tri positions (no normals anywhere)
            {"bufferView": 4, "componentType": 5126, "count": 6,
             "type": "VEC3"},
            # 7-9: strip positions/normals/indices
            {"bufferView": 5, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 6, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 7, "componentType": 5123, "count": 4,
             "type": "SCALAR"},
            # 10-12: sparse positions + normals + indices
            {"bufferView": 8, "componentType": 5126, "count": 3,
             "type": "VEC3",
             "sparse": {"count": 1,
                        "indices": {"bufferView": 10, "componentType": 5123},
                        "values": {"bufferView": 11}}},
            {"bufferView": 9, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 12, "componentType": 5123, "count": 3,
             "type": "SCALAR"},
            # 13-14: lines
            {"bufferView": 13, "componentType": 5126, "count": 2,
             "type": "VEC3"},
            {"bufferView": 14, "componentType": 5123, "count": 2,
             "type": "SCALAR"},
        ],
        "images": [{"uri": data_uri}],
        "textures": [{"source": 0}],
        "materials": [{
            "pbrMetallicRoughness": {
                "baseColorTexture": {"index": 0},
                "metallicFactor": 0.0,
            },
        }],
        "meshes": [{"primitives": [
            {"attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2,
                            "TANGENT": 4, "COLOR_0": 5},
             "indices": 3, "material": 0},
            {"attributes": {"POSITION": 6}},                    # non-indexed
            {"attributes": {"POSITION": 7, "NORMAL": 8},
             "indices": 9, "mode": 5},                          # strip
            {"attributes": {"POSITION": 10, "NORMAL": 11},
             "indices": 12},                                    # sparse
            {"attributes": {"POSITION": 13}, "indices": 14, "mode": 1},
        ]}],
    }
    return build_glb(doc, bin_data)
