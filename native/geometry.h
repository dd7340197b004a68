// Vertex/attribute store for one geometry (one BLAS).
// Capability parity: reference rust-shader-tools/src/geometry.rs.
#pragma once
#include <cstdint>
#include <optional>
#include <vector>

#include "scene_types.h"
#include "vecmath.h"

namespace wrt {

struct Mesh;  // mesh_obj.h

// Per-triangle attribute record is 16 floats:
//   data0: base_color.rgb, mat_type (f32-encoded)
//   data1: metallic, roughness, ior, 0
//   data2: base/metrough/normal/emissive texture indices (-1 = none)
//   data3: emissive.rgb, occlusion tex index
// (reference geometry.rs:68-103; consumed as MeshTopology in the kernels)
constexpr size_t ATTR_STRIDE = 16;

class Geometry {
 public:
  // Flattened (post-skinning) buffers, refreshed by the rebuilder.
  std::vector<float> vertices;  // xyzw (w unused here; packed as 1.0 later)
  std::vector<float> normals;   // xyzw
  std::vector<float> uvs;       // uv

  // Bind-pose data used as skinning input.
  std::vector<Vec3> base_positions;
  std::vector<Vec3> base_normals;
  std::vector<Vec2> base_uvs;

  std::vector<uint32_t> indices;      // 3 per triangle
  std::vector<float> attributes;      // ATTR_STRIDE per triangle

  std::vector<uint32_t> joints;   // 4 per vertex
  std::vector<float> weights;     // 4 per vertex

  std::optional<size_t> skin_index;

  uint32_t push_vertex(const Vec3& v, const Vec3& n, const Vec2& uv);
  uint32_t push_vertex_skinned(const Vec3& v, const Vec3& n, const Vec2& uv,
                               const uint32_t j[4], const float w[4]);
  void push_attributes(const Vec3& base_color, uint32_t mat, float metallic,
                       float roughness, float ior, const Vec3& emissive,
                       const float tex_indices[4], float occlusion_tex);

  // Derive (metallic, roughness, ior) from the simple-material convention used
  // by presets: METAL -> (1, extra, 1.5), DIELECTRIC -> (0, 0, extra),
  // else (0, 1, 1.5). (reference scene/helpers.rs:24-28)
  static void simple_material(uint32_t mat, float extra, float* metallic,
                              float* roughness, float* ior);

  static Geometry from_mesh(const Mesh& mesh);

  // Recenter + scale the bind pose into a unit cube (reference geometry.rs:132-162).
  void normalize_scale();

  void add_triangle(const Vec3& v0, const Vec3& v1, const Vec3& v2,
                    const Vec3& color, uint32_t mat, float extra, float tex_index);
  // 24x12 UV sphere (reference geometry.rs:204-275).
  void add_sphere(const Vec3& center, float radius, const Vec3& color,
                  uint32_t mat, float extra, float tex_index);
  // Bake a TRS-transformed OBJ mesh into this geometry (reference geometry.rs:277-326).
  void add_mesh_instance(const Mesh& mesh, const Vec3& pos, float scale,
                         float rot_y_deg, const Vec3& color, uint32_t mat,
                         float extra, float tex_index);

  size_t vertex_count() const { return base_positions.size(); }
  size_t triangle_count() const { return indices.size() / 3; }
};

}  // namespace wrt
