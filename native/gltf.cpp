// glTF 2.0 / GLB / VRM loader.
// Capability parity: reference rust-shader-tools/src/loader.rs:8-354 —
// textures from buffer views, node hierarchy with parent resolution, skins
// with inverse bind matrices, one Geometry per mesh primitive with
// POSITION/NORMAL/TEXCOORD_0/JOINTS_0/WEIGHTS_0 + indices, PBR material ->
// mat_type mapping (metallic>0 -> METAL, emissive -> LIGHT, else LAMBERTIAN),
// four texture slots + occlusion, static node transform baked into the
// instance (skinned meshes at identity), and animation channels with
// Linear/Step/CubicSpline interpolation.
#include "gltf.h"

#include <cmath>
#include <cstring>
#include <map>

#include "json.h"

namespace wrt {
namespace {

using json::Value;

struct BufferView {
  size_t offset = 0;
  size_t length = 0;
  size_t stride = 0;  // 0 = tightly packed
};

struct Accessor {
  int buffer_view = -1;
  size_t offset = 0;
  int component_type = 5126;
  bool normalized = false;
  size_t count = 0;
  int n_components = 1;  // SCALAR=1, VEC2=2, VEC3=3, VEC4=4, MAT4=16
  // Sparse substitution (exporters emit these for morph-target deltas and
  // compact position overrides): `sparse.count` indices into this accessor
  // whose values are replaced from a second buffer view.
  size_t sparse_count = 0;
  int sparse_idx_bv = -1;
  size_t sparse_idx_off = 0;
  int sparse_idx_ct = 5125;
  int sparse_val_bv = -1;
  size_t sparse_val_off = 0;
};

int components_of(const std::string& type) {
  if (type == "SCALAR") return 1;
  if (type == "VEC2") return 2;
  if (type == "VEC3") return 3;
  if (type == "VEC4") return 4;
  if (type == "MAT2") return 4;
  if (type == "MAT3") return 9;
  if (type == "MAT4") return 16;
  return 1;
}

size_t component_size(int ct) {
  switch (ct) {
    case 5120: case 5121: return 1;  // byte / ubyte
    case 5122: case 5123: return 2;  // short / ushort
    case 5125: case 5126: return 4;  // uint / float
    default: return 4;
  }
}

class Gltf {
 public:
  Value doc;
  const uint8_t* bin = nullptr;
  size_t bin_len = 0;
  std::vector<BufferView> views;
  std::vector<Accessor> accessors;

  bool init(const Value& d, const uint8_t* bin_data, size_t bin_size) {
    doc = d;
    bin = bin_data;
    bin_len = bin_size;
    for (size_t i = 0; i < doc["bufferViews"].size(); ++i) {
      const Value& v = doc["bufferViews"][i];
      BufferView bv;
      bv.offset = (size_t)v["byteOffset"].as_int(0);
      bv.length = (size_t)v["byteLength"].as_int(0);
      bv.stride = (size_t)v["byteStride"].as_int(0);
      views.push_back(bv);
    }
    for (size_t i = 0; i < doc["accessors"].size(); ++i) {
      const Value& a = doc["accessors"][i];
      Accessor acc;
      acc.buffer_view = (int)a["bufferView"].as_int(-1);
      acc.offset = (size_t)a["byteOffset"].as_int(0);
      acc.component_type = (int)a["componentType"].as_int(5126);
      acc.normalized = a["normalized"].boolean(false);
      acc.count = (size_t)a["count"].as_int(0);
      acc.n_components = components_of(a["type"].str());
      if (a.has("sparse")) {
        const Value& sp = a["sparse"];
        acc.sparse_count = (size_t)sp["count"].as_int(0);
        acc.sparse_idx_bv = (int)sp["indices"]["bufferView"].as_int(-1);
        acc.sparse_idx_off = (size_t)sp["indices"]["byteOffset"].as_int(0);
        acc.sparse_idx_ct = (int)sp["indices"]["componentType"].as_int(5125);
        acc.sparse_val_bv = (int)sp["values"]["bufferView"].as_int(-1);
        acc.sparse_val_off = (size_t)sp["values"]["byteOffset"].as_int(0);
      }
      accessors.push_back(acc);
    }
    return true;
  }

  // One component as float (normalized integer conversion applied).
  float decode_f32(const uint8_t* ptr, int ct, bool normalized) const {
    float f = 0.f;
    switch (ct) {
      case 5126: std::memcpy(&f, ptr, 4); break;
      case 5121: {
        uint8_t v = *ptr;
        f = normalized ? v / 255.f : (float)v;
        break;
      }
      case 5120: {
        int8_t v;
        std::memcpy(&v, ptr, 1);
        f = normalized ? std::max(v / 127.f, -1.f) : (float)v;
        break;
      }
      case 5123: {
        uint16_t v;
        std::memcpy(&v, ptr, 2);
        f = normalized ? v / 65535.f : (float)v;
        break;
      }
      case 5122: {
        int16_t v;
        std::memcpy(&v, ptr, 2);
        f = normalized ? std::max(v / 32767.f, -1.f) : (float)v;
        break;
      }
      case 5125: {
        uint32_t v;
        std::memcpy(&v, ptr, 4);
        f = (float)v;
        break;
      }
    }
    return f;
  }

  // Sparse substitution (glTF 2.0 accessor.sparse): replace `sparse_count`
  // elements of the base array (which may be a zero-filled bufferView-less
  // base) with values from the sparse values view.
  void apply_sparse_f32(const Accessor& a, std::vector<float>* out) const {
    if (!a.sparse_count || a.sparse_idx_bv < 0 || a.sparse_val_bv < 0 ||
        (size_t)a.sparse_idx_bv >= views.size() ||
        (size_t)a.sparse_val_bv >= views.size())
      return;
    const BufferView& ibv = views[a.sparse_idx_bv];
    const BufferView& vbv = views[a.sparse_val_bv];
    size_t isz = component_size(a.sparse_idx_ct);
    size_t vsz = component_size(a.component_type);
    size_t elem = vsz * a.n_components;
    for (size_t k = 0; k < a.sparse_count; ++k) {
      size_t ibase = ibv.offset + a.sparse_idx_off + k * isz;
      size_t vbase = vbv.offset + a.sparse_val_off + k * elem;
      if (ibase + isz > bin_len || vbase + elem > bin_len) break;
      uint32_t tgt = 0;
      if (isz == 1) tgt = bin[ibase];
      else if (isz == 2) {
        uint16_t h;
        std::memcpy(&h, bin + ibase, 2);
        tgt = h;
      } else {
        std::memcpy(&tgt, bin + ibase, 4);
      }
      if ((size_t)tgt >= a.count) continue;
      for (int c = 0; c < a.n_components; ++c) {
        (*out)[tgt * a.n_components + c] =
            decode_f32(bin + vbase + c * vsz, a.component_type, a.normalized);
      }
    }
  }

  // Reads accessor `idx` as floats (normalized integer conversion applied;
  // sparse substitution applied; a bufferView-less accessor is the spec's
  // zero-filled base).
  std::vector<float> read_f32(int idx) const {
    std::vector<float> out;
    if (idx < 0 || (size_t)idx >= accessors.size()) return out;
    const Accessor& a = accessors[idx];
    if (a.buffer_view < 0 || (size_t)a.buffer_view >= views.size()) {
      out.assign(a.count * a.n_components, 0.f);
      apply_sparse_f32(a, &out);
      return out;
    }
    const BufferView& bv = views[a.buffer_view];
    size_t elem = component_size(a.component_type) * a.n_components;
    size_t stride = bv.stride ? bv.stride : elem;
    out.reserve(a.count * a.n_components);
    for (size_t i = 0; i < a.count; ++i) {
      size_t base = bv.offset + a.offset + i * stride;
      if (base + elem > bin_len) break;
      for (int c = 0; c < a.n_components; ++c) {
        const uint8_t* ptr = bin + base + c * component_size(a.component_type);
        float f = 0.f;
        switch (a.component_type) {
          case 5126: {
            std::memcpy(&f, ptr, 4);
            break;
          }
          case 5121: {
            uint8_t v = *ptr;
            f = a.normalized ? v / 255.f : (float)v;
            break;
          }
          case 5120: {
            int8_t v;
            std::memcpy(&v, ptr, 1);
            f = a.normalized ? std::max(v / 127.f, -1.f) : (float)v;
            break;
          }
          case 5123: {
            uint16_t v;
            std::memcpy(&v, ptr, 2);
            f = a.normalized ? v / 65535.f : (float)v;
            break;
          }
          case 5122: {
            int16_t v;
            std::memcpy(&v, ptr, 2);
            f = a.normalized ? std::max(v / 32767.f, -1.f) : (float)v;
            break;
          }
          case 5125: {
            uint32_t v;
            std::memcpy(&v, ptr, 4);
            f = (float)v;
            break;
          }
        }
        out.push_back(f);
      }
    }
    apply_sparse_f32(a, &out);
    return out;
  }

  std::vector<uint32_t> read_u32(int idx) const {
    std::vector<uint32_t> out;
    if (idx < 0 || (size_t)idx >= accessors.size()) return out;
    const Accessor& a = accessors[idx];
    if (a.buffer_view < 0 || (size_t)a.buffer_view >= views.size()) return out;
    const BufferView& bv = views[a.buffer_view];
    size_t elem = component_size(a.component_type) * a.n_components;
    size_t stride = bv.stride ? bv.stride : elem;
    out.reserve(a.count * a.n_components);
    for (size_t i = 0; i < a.count; ++i) {
      size_t base = bv.offset + a.offset + i * stride;
      if (base + elem > bin_len) break;
      for (int c = 0; c < a.n_components; ++c) {
        const uint8_t* ptr = bin + base + c * component_size(a.component_type);
        uint32_t v = 0;
        switch (a.component_type) {
          case 5121: v = *ptr; break;
          case 5123: {
            uint16_t h;
            std::memcpy(&h, ptr, 2);
            v = h;
            break;
          }
          case 5125: std::memcpy(&v, ptr, 4); break;
          case 5120: {
            int8_t s;
            std::memcpy(&s, ptr, 1);
            v = (uint32_t)std::max((int)s, 0);
            break;
          }
          case 5122: {
            int16_t s;
            std::memcpy(&s, ptr, 2);
            v = (uint32_t)std::max((int)s, 0);
            break;
          }
          case 5126: {
            float f;
            std::memcpy(&f, ptr, 4);
            v = (uint32_t)f;
            break;
          }
        }
        out.push_back(v);
      }
    }
    return out;
  }
};

// Decompose a column-major 4x4 into TRS (matching glam's decomposed()).
void decompose(const float m[16], Vec3* t, Quat* r, Vec3* s) {
  *t = {m[12], m[13], m[14]};
  Vec3 c0{m[0], m[1], m[2]};
  Vec3 c1{m[4], m[5], m[6]};
  Vec3 c2{m[8], m[9], m[10]};
  float det = c0.dot(c1.cross(c2));
  Vec3 sc{c0.length(), c1.length(), c2.length()};
  if (det < 0) sc.x = -sc.x;
  *s = sc;
  if (sc.x != 0) c0 = c0 / sc.x;
  if (sc.y != 0) c1 = c1 / sc.y;
  if (sc.z != 0) c2 = c2 / sc.z;
  // Rotation matrix (columns c0,c1,c2) -> quaternion (Shepperd).
  float trace = c0.x + c1.y + c2.z;
  Quat q;
  if (trace > 0.f) {
    float w = std::sqrt(trace + 1.f) * 0.5f;
    float inv = 0.25f / w;
    q = Quat((c1.z - c2.y) * inv, (c2.x - c0.z) * inv, (c0.y - c1.x) * inv, w);
  } else if (c0.x >= c1.y && c0.x >= c2.z) {
    float x = std::sqrt(1.f + c0.x - c1.y - c2.z) * 0.5f;
    float inv = 0.25f / x;
    q = Quat(x, (c0.y + c1.x) * inv, (c2.x + c0.z) * inv, (c1.z - c2.y) * inv);
  } else if (c1.y > c2.z) {
    float y = std::sqrt(1.f + c1.y - c0.x - c2.z) * 0.5f;
    float inv = 0.25f / y;
    q = Quat((c0.y + c1.x) * inv, y, (c1.z + c2.y) * inv, (c2.x - c0.z) * inv);
  } else {
    float z = std::sqrt(1.f + c2.z - c0.x - c1.y) * 0.5f;
    float inv = 0.25f / z;
    q = Quat((c2.x + c0.z) * inv, (c1.z + c2.y) * inv, z, (c0.y - c1.x) * inv);
  }
  *r = q.normalized();
}

void node_trs(const Value& n, Vec3* t, Quat* r, Vec3* s) {
  *t = {0, 0, 0};
  *r = Quat();
  *s = {1, 1, 1};
  if (n.has("matrix")) {
    float m[16];
    for (int i = 0; i < 16; ++i) m[i] = (float)n["matrix"][i].num(i % 5 == 0 ? 1 : 0);
    decompose(m, t, r, s);
    return;
  }
  if (n.has("translation")) {
    *t = {(float)n["translation"][0].num(), (float)n["translation"][1].num(),
          (float)n["translation"][2].num()};
  }
  if (n.has("rotation")) {
    *r = Quat((float)n["rotation"][0].num(), (float)n["rotation"][1].num(),
              (float)n["rotation"][2].num(), (float)n["rotation"][3].num(1));
  }
  if (n.has("scale")) {
    *s = {(float)n["scale"][0].num(1), (float)n["scale"][1].num(1),
          (float)n["scale"][2].num(1)};
  }
}

std::vector<uint8_t> decode_base64(const char* b, size_t n) {
  auto val = [](char c) -> int {
    if (c >= 'A' && c <= 'Z') return c - 'A';
    if (c >= 'a' && c <= 'z') return c - 'a' + 26;
    if (c >= '0' && c <= '9') return c - '0' + 52;
    if (c == '+') return 62;
    if (c == '/') return 63;
    return -1;
  };
  std::vector<uint8_t> out;
  out.reserve(n / 4 * 3);
  int acc = 0, bits = 0;
  for (size_t i = 0; i < n; ++i) {
    int v = val(b[i]);
    if (v < 0) continue;  // skip '=', whitespace
    acc = (acc << 6) | v;
    bits += 6;
    if (bits >= 8) {
      bits -= 8;
      out.push_back((uint8_t)((acc >> bits) & 0xFF));
    }
  }
  return out;
}

}  // namespace

bool load_gltf(std::vector<Geometry>& geometries,
               std::vector<SceneInstance>& instances, std::vector<Node>& nodes,
               std::vector<Skin>& skins, std::vector<Animation>& animations,
               std::vector<std::vector<uint8_t>>& textures,
               const uint8_t* data, size_t len) {
  // --- GLB container ---
  if (len < 12) return false;
  uint32_t magic, version, total;
  std::memcpy(&magic, data, 4);
  std::memcpy(&version, data + 4, 4);
  std::memcpy(&total, data + 8, 4);
  if (magic != 0x46546C67u) return false;  // "glTF"

  const char* json_data = nullptr;
  size_t json_len = 0;
  const uint8_t* bin_data = nullptr;
  size_t bin_len = 0;

  size_t off = 12;
  while (off + 8 <= len) {
    uint32_t chunk_len, chunk_type;
    std::memcpy(&chunk_len, data + off, 4);
    std::memcpy(&chunk_type, data + off + 4, 4);
    off += 8;
    if (off + chunk_len > len) break;
    if (chunk_type == 0x4E4F534Au) {  // "JSON"
      json_data = (const char*)(data + off);
      json_len = chunk_len;
    } else if (chunk_type == 0x004E4942u) {  // "BIN\0"
      bin_data = data + off;
      bin_len = chunk_len;
    }
    off += chunk_len;
  }
  if (!json_data) return false;

  bool ok = false;
  Value doc = json::parse(json_data, json_len, &ok);
  if (!ok) return false;

  Gltf g;
  g.init(doc, bin_data, bin_len);

  // --- 0. Textures: raw encoded bytes from buffer views (loader.rs:22-36).
  // Iterate textures (not images) so indices match material references.
  for (size_t ti = 0; ti < doc["textures"].size(); ++ti) {
    int img = (int)doc["textures"][ti]["source"].as_int(-1);
    std::vector<uint8_t> bytes;
    if (img >= 0 && (size_t)img < doc["images"].size()) {
      const Value& image = doc["images"][img];
      int bv = (int)image["bufferView"].as_int(-1);
      if (bv >= 0 && (size_t)bv < g.views.size()) {
        const BufferView& view = g.views[bv];
        if (view.offset + view.length <= bin_len) {
          bytes.assign(bin_data + view.offset,
                       bin_data + view.offset + view.length);
        }
      } else if (image["uri"].is_string()) {
        // Exporters may embed images as base64 data: URIs instead of
        // buffer views; external-file URIs are not resolvable from a
        // byte-stream load and yield the 1x1 fallback texture downstream.
        const std::string& uri = image["uri"].str();
        size_t comma = uri.find(',');
        if (uri.rfind("data:", 0) == 0 && comma != std::string::npos &&
            uri.find(";base64", 0) != std::string::npos) {
          bytes = decode_base64(uri.data() + comma + 1,
                                uri.size() - comma - 1);
        }
      }
    }
    textures.push_back(std::move(bytes));
  }

  // --- 1. Nodes (loader.rs:38-64) ---
  size_t node_count = doc["nodes"].size();
  nodes.clear();
  nodes.resize(node_count);
  for (size_t i = 0; i < node_count; ++i) {
    const Value& n = doc["nodes"][i];
    nodes[i].name = n["name"].is_string() ? n["name"].str() : "";
    node_trs(n, &nodes[i].translation, &nodes[i].rotation, &nodes[i].scale);
    for (size_t c = 0; c < n["children"].size(); ++c) {
      nodes[i].children_indices.push_back((size_t)n["children"][c].as_int());
    }
  }
  for (size_t i = 0; i < node_count; ++i) {
    for (size_t child : nodes[i].children_indices) {
      if (child < node_count) nodes[child].parent_index = i;
    }
  }

  // --- 2. Skins (loader.rs:66-82) ---
  for (size_t si = 0; si < doc["skins"].size(); ++si) {
    const Value& s = doc["skins"][si];
    Skin skin;
    for (size_t j = 0; j < s["joints"].size(); ++j) {
      skin.joints.push_back((size_t)s["joints"][j].as_int());
    }
    int ibm = (int)s["inverseBindMatrices"].as_int(-1);
    if (ibm >= 0) {
      std::vector<float> mats = g.read_f32(ibm);
      for (size_t m = 0; m + 16 <= mats.size(); m += 16) {
        Mat4 mat;
        std::memcpy(&mat.m[0][0], &mats[m], 16 * sizeof(float));
        skin.inverse_bind_matrices.push_back(mat);
      }
    }
    while (skin.inverse_bind_matrices.size() < skin.joints.size()) {
      skin.inverse_bind_matrices.push_back(Mat4::identity());
    }
    skins.push_back(std::move(skin));
  }

  // --- 3. Meshes -> Geometries (loader.rs:84-221) ---
  std::map<size_t, std::vector<size_t>> mesh_to_geo;
  for (size_t mi = 0; mi < doc["meshes"].size(); ++mi) {
    const Value& mesh = doc["meshes"][mi];
    std::vector<size_t> geo_indices;
    for (size_t pi = 0; pi < mesh["primitives"].size(); ++pi) {
      const Value& prim = mesh["primitives"][pi];
      const Value& attrs = prim["attributes"];
      // Unknown attributes (TANGENT, COLOR_n, TEXCOORD_n>0, custom
      // underscore-prefixed) are ignored by construction: only the five
      // semantics below are read.

      int mode = (int)prim["mode"].as_int(4);
      if (mode < 4 || mode > 6) continue;  // points/lines: nothing to trace

      std::vector<float> pos = g.read_f32((int)attrs["POSITION"].as_int(-1));
      size_t vcount = pos.size() / 3;
      if (vcount == 0) continue;

      std::vector<float> nrm = g.read_f32((int)attrs["NORMAL"].as_int(-1));
      std::vector<float> uv = g.read_f32((int)attrs["TEXCOORD_0"].as_int(-1));
      std::vector<uint32_t> joints =
          g.read_u32((int)attrs["JOINTS_0"].as_int(-1));
      std::vector<float> weights =
          g.read_f32((int)attrs["WEIGHTS_0"].as_int(-1));

      std::vector<uint32_t> indices = g.read_u32((int)prim["indices"].as_int(-1));
      if (indices.empty()) {  // non-indexed primitive (spec: consecutive)
        indices.resize(vcount);
        for (size_t i = 0; i < vcount; ++i) indices[i] = (uint32_t)i;
      }
      if (mode == 5) {  // TRIANGLE_STRIP -> triangle list, winding-corrected
        std::vector<uint32_t> tri;
        for (size_t i = 0; i + 2 < indices.size(); ++i) {
          if (i % 2 == 0)
            tri.insert(tri.end(),
                       {indices[i], indices[i + 1], indices[i + 2]});
          else
            tri.insert(tri.end(),
                       {indices[i + 1], indices[i], indices[i + 2]});
        }
        indices = std::move(tri);
      } else if (mode == 6) {  // TRIANGLE_FAN
        std::vector<uint32_t> tri;
        for (size_t i = 1; i + 1 < indices.size(); ++i) {
          tri.insert(tri.end(), {indices[0], indices[i], indices[i + 1]});
        }
        indices = std::move(tri);
      }
      if (nrm.size() < vcount * 3) {
        // NORMAL absent: the spec says implementations MUST compute flat
        // normals; area-weighted vertex accumulation gives flat shading on
        // unshared vertices and smooth shading on shared ones.
        nrm.assign(vcount * 3, 0.f);
        for (size_t t = 0; t + 2 < indices.size(); t += 3) {
          uint32_t i0 = indices[t], i1 = indices[t + 1], i2 = indices[t + 2];
          if (i0 >= vcount || i1 >= vcount || i2 >= vcount) continue;
          Vec3 p0{pos[i0 * 3], pos[i0 * 3 + 1], pos[i0 * 3 + 2]};
          Vec3 p1{pos[i1 * 3], pos[i1 * 3 + 1], pos[i1 * 3 + 2]};
          Vec3 p2{pos[i2 * 3], pos[i2 * 3 + 1], pos[i2 * 3 + 2]};
          Vec3 fn = (p1 - p0).cross(p2 - p0);  // area-weighted
          for (uint32_t vi : {i0, i1, i2}) {
            nrm[vi * 3] += fn.x;
            nrm[vi * 3 + 1] += fn.y;
            nrm[vi * 3 + 2] += fn.z;
          }
        }
        for (size_t k = 0; k < vcount; ++k) {
          Vec3 n{nrm[k * 3], nrm[k * 3 + 1], nrm[k * 3 + 2]};
          float l = n.length();
          n = l > 1e-20f ? n / l : Vec3{0, 1, 0};
          nrm[k * 3] = n.x;
          nrm[k * 3 + 1] = n.y;
          nrm[k * 3 + 2] = n.z;
        }
      }

      // Material (PBR -> mat_type, loader.rs:136-176)
      Vec3 col{1, 1, 1};
      float metallic = 1.f, roughness = 1.f;  // glTF defaults
      Vec3 emissive{0, 0, 0};
      float tex_idx[4] = {-1.f, -1.f, -1.f, -1.f};
      float occl = -1.f;
      int mat_i = (int)prim["material"].as_int(-1);
      if (mat_i >= 0 && (size_t)mat_i < doc["materials"].size()) {
        const Value& m = doc["materials"][mat_i];
        const Value& pbr = m["pbrMetallicRoughness"];
        if (pbr.has("baseColorFactor")) {
          col = {(float)pbr["baseColorFactor"][0].num(1),
                 (float)pbr["baseColorFactor"][1].num(1),
                 (float)pbr["baseColorFactor"][2].num(1)};
        }
        metallic = (float)pbr["metallicFactor"].num(1.0);
        roughness = (float)pbr["roughnessFactor"].num(1.0);
        if (m.has("emissiveFactor")) {
          emissive = {(float)m["emissiveFactor"][0].num(),
                      (float)m["emissiveFactor"][1].num(),
                      (float)m["emissiveFactor"][2].num()};
        }
        if (pbr["baseColorTexture"].has("index"))
          tex_idx[0] = (float)pbr["baseColorTexture"]["index"].as_int();
        if (pbr["metallicRoughnessTexture"].has("index"))
          tex_idx[1] = (float)pbr["metallicRoughnessTexture"]["index"].as_int();
        if (m["normalTexture"].has("index"))
          tex_idx[2] = (float)m["normalTexture"]["index"].as_int();
        if (m["emissiveTexture"].has("index"))
          tex_idx[3] = (float)m["emissiveTexture"]["index"].as_int();
        if (m["occlusionTexture"].has("index"))
          occl = (float)m["occlusionTexture"]["index"].as_int();
      }
      uint32_t mat_type = mat_type::LAMBERTIAN;
      if (metallic > 0.f) mat_type = mat_type::METAL;
      if (emissive.dot(emissive) > 1e-4f) mat_type = mat_type::LIGHT;

      Geometry geom;
      for (size_t k = 0; k < vcount; ++k) {
        Vec3 p{pos[k * 3], pos[k * 3 + 1], pos[k * 3 + 2]};
        Vec3 n = k * 3 + 2 < nrm.size()
                     ? Vec3{nrm[k * 3], nrm[k * 3 + 1], nrm[k * 3 + 2]}
                     : Vec3{0, 1, 0};
        Vec2 t = k * 2 + 1 < uv.size() ? Vec2{uv[k * 2], uv[k * 2 + 1]}
                                       : Vec2{0, 0};
        uint32_t j[4] = {0, 0, 0, 0};
        float w[4] = {0, 0, 0, 0};
        if (k * 4 + 3 < joints.size()) {
          for (int q = 0; q < 4; ++q) j[q] = joints[k * 4 + q];
        }
        if (k * 4 + 3 < weights.size()) {
          for (int q = 0; q < 4; ++q) w[q] = weights[k * 4 + q];
        }
        geom.push_vertex_skinned(p, n, t, j, w);
      }
      for (size_t t = 0; t + 2 < indices.size(); t += 3) {
        geom.indices.insert(geom.indices.end(),
                            {indices[t], indices[t + 1], indices[t + 2]});
        geom.push_attributes(col, mat_type, metallic, roughness, 1.5f,
                             emissive, tex_idx, occl);
      }

      geo_indices.push_back(geometries.size());
      geometries.push_back(std::move(geom));
    }
    mesh_to_geo[mi] = geo_indices;
  }

  // --- 4. Instances (loader.rs:223-293): skinned meshes at identity,
  // static meshes bake the node's LOCAL transform.
  for (size_t ni = 0; ni < node_count; ++ni) {
    const Value& n = doc["nodes"][ni];
    if (!n.has("mesh")) continue;
    size_t mesh_idx = (size_t)n["mesh"].as_int();
    auto it = mesh_to_geo.find(mesh_idx);
    if (it == mesh_to_geo.end()) continue;
    bool has_skin = n.has("skin");
    size_t skin_idx = (size_t)n["skin"].as_int(0);
    Mat4 transform = Mat4::identity();
    if (!has_skin) {
      transform = Mat4::from_scale_rotation_translation(
          nodes[ni].scale, nodes[ni].rotation, nodes[ni].translation);
    }
    for (size_t geo_idx : it->second) {
      if (has_skin && geo_idx < geometries.size()) {
        geometries[geo_idx].skin_index = skin_idx;
      }
      instances.push_back(SceneInstance{transform, geo_idx});
    }
  }

  // --- 5. Animations (loader.rs:295-351) ---
  for (size_t ai = 0; ai < doc["animations"].size(); ++ai) {
    const Value& a = doc["animations"][ai];
    Animation anim;
    anim.name = a["name"].is_string() ? a["name"].str() : "anim";
    float max_time = 0.f;
    for (size_t ci = 0; ci < a["channels"].size(); ++ci) {
      const Value& ch = a["channels"][ci];
      int sampler_i = (int)ch["sampler"].as_int(-1);
      if (sampler_i < 0 || (size_t)sampler_i >= a["samplers"].size()) continue;
      const Value& sampler = a["samplers"][sampler_i];
      const std::string& path = ch["target"]["path"].str();

      AnimationChannel channel;
      channel.target_node_index = (size_t)ch["target"]["node"].as_int(0);
      const std::string& interp = sampler["interpolation"].str();
      channel.interpolation =
          interp == "STEP" ? Interpolation::Step
          : interp == "CUBICSPLINE" ? Interpolation::CubicSpline
                                    : Interpolation::Linear;

      channel.inputs = g.read_f32((int)sampler["input"].as_int(-1));
      std::vector<float> out = g.read_f32((int)sampler["output"].as_int(-1));

      if (path == "translation" || path == "scale") {
        channel.path = path == "translation" ? ChannelPath::Translation
                                             : ChannelPath::Scale;
        for (size_t v = 0; v + 2 < out.size(); v += 3) {
          channel.out_vec3.push_back({out[v], out[v + 1], out[v + 2]});
        }
      } else if (path == "rotation") {
        channel.path = ChannelPath::Rotation;
        for (size_t v = 0; v + 3 < out.size(); v += 4) {
          channel.out_quat.push_back(
              Quat(out[v], out[v + 1], out[v + 2], out[v + 3]));
        }
      } else {
        continue;  // weights (morph targets) unsupported, like the reference
      }
      if (!channel.inputs.empty()) {
        max_time = std::max(max_time, channel.inputs.back());
      }
      anim.channels.push_back(std::move(channel));
    }
    anim.duration = max_time;
    animations.push_back(std::move(anim));
  }

  return true;
}

}  // namespace wrt
