#include "mesh_obj.h"

#include <cstdlib>
#include <sstream>
#include <unordered_map>

namespace wrt {
namespace {

struct Key {
  int64_t p, t, n;
  bool operator==(const Key& o) const { return p == o.p && t == o.t && n == o.n; }
};
struct KeyHash {
  size_t operator()(const Key& k) const {
    size_t h = (size_t)k.p * 0x9E3779B97F4A7C15ull;
    h ^= (size_t)(k.t + 1) * 0xC2B2AE3D27D4EB4Full + (h << 6);
    h ^= (size_t)(k.n + 1) * 0x165667B19E3779F9ull + (h >> 2);
    return h;
  }
};

float parse_f(const std::string& s) {
  char* end = nullptr;
  float v = std::strtof(s.c_str(), &end);
  return end == s.c_str() ? 0.f : v;
}

}  // namespace

Mesh Mesh::parse(const std::string& source) {
  Mesh mesh;
  std::vector<Vec3> raw_positions;
  std::vector<Vec3> raw_normals;
  std::vector<Vec2> raw_uvs;
  // Unlike the reference's linear unique-vertex scan (mesh.rs:73), use a hash
  // map — same dedup semantics, O(1) per lookup.
  std::unordered_map<Key, uint32_t, KeyHash> unique;

  std::istringstream stream(source);
  std::string line;
  std::vector<std::string> parts;
  std::vector<uint32_t> face_indices;

  while (std::getline(stream, line)) {
    parts.clear();
    std::istringstream ls(line);
    std::string tok;
    while (ls >> tok) parts.push_back(tok);
    if (parts.empty()) continue;

    if (parts[0] == "v" && parts.size() >= 4) {
      raw_positions.push_back({parse_f(parts[1]), parse_f(parts[2]), parse_f(parts[3])});
    } else if (parts[0] == "vt" && parts.size() >= 3) {
      raw_uvs.push_back({parse_f(parts[1]), parse_f(parts[2])});
    } else if (parts[0] == "vn" && parts.size() >= 4) {
      raw_normals.push_back({parse_f(parts[1]), parse_f(parts[2]), parse_f(parts[3])});
    } else if (parts[0] == "f") {
      face_indices.clear();
      for (size_t pi = 1; pi < parts.size(); ++pi) {
        const std::string& part = parts[pi];
        // split on '/': p[/t][/n]; 1-based OBJ indices
        int64_t idx[3] = {-1, -1, -1};
        size_t start = 0;
        for (int seg = 0; seg < 3; ++seg) {
          size_t slash = part.find('/', start);
          std::string s = part.substr(start, slash == std::string::npos
                                                 ? std::string::npos
                                                 : slash - start);
          if (!s.empty()) {
            long v = std::strtol(s.c_str(), nullptr, 10);
            idx[seg] = v > 0 ? v - 1 : 0;
          }
          if (slash == std::string::npos) break;
          start = slash + 1;
        }
        Key key{idx[0] < 0 ? 0 : idx[0], idx[1], idx[2]};
        auto it = unique.find(key);
        uint32_t out_idx;
        if (it != unique.end()) {
          out_idx = it->second;
        } else {
          out_idx = (uint32_t)mesh.vertices.size();
          unique.emplace(key, out_idx);
          mesh.vertices.push_back(
              key.p < (int64_t)raw_positions.size() ? raw_positions[key.p]
                                                    : Vec3{0, 0, 0});
          mesh.uvs.push_back(key.t >= 0 && key.t < (int64_t)raw_uvs.size()
                                 ? raw_uvs[key.t]
                                 : Vec2{0, 0});
          mesh.normals.push_back(key.n >= 0 && key.n < (int64_t)raw_normals.size()
                                     ? raw_normals[key.n]
                                     : Vec3{0, 1, 0});
        }
        face_indices.push_back(out_idx);
      }
      // fan triangulation
      for (size_t i = 1; i + 1 < face_indices.size(); ++i) {
        mesh.indices.push_back(face_indices[0]);
        mesh.indices.push_back(face_indices[i]);
        mesh.indices.push_back(face_indices[i + 1]);
      }
    }
  }
  return mesh;
}

}  // namespace wrt
