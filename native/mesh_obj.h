// Wavefront OBJ parser: v/vt/vn/f with p/t/n triplet dedup and polygon fan
// triangulation. Capability parity: reference rust-shader-tools/src/mesh.rs.
#pragma once
#include <cstdint>
#include <string>
#include <vector>

#include "vecmath.h"

namespace wrt {

struct Mesh {
  std::vector<Vec3> vertices;
  std::vector<Vec3> normals;
  std::vector<Vec2> uvs;
  std::vector<uint32_t> indices;

  static Mesh parse(const std::string& source);
};

}  // namespace wrt
