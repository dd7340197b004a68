#include "geometry.h"

#include <cmath>
#include <limits>

#include "mesh_obj.h"

namespace wrt {

uint32_t Geometry::push_vertex(const Vec3& v, const Vec3& n, const Vec2& uv) {
  const uint32_t j[4] = {0, 0, 0, 0};
  const float w[4] = {0, 0, 0, 0};
  return push_vertex_skinned(v, n, uv, j, w);
}

uint32_t Geometry::push_vertex_skinned(const Vec3& v, const Vec3& n,
                                       const Vec2& uv, const uint32_t j[4],
                                       const float w[4]) {
  vertices.insert(vertices.end(), {v.x, v.y, v.z, 0.f});
  normals.insert(normals.end(), {n.x, n.y, n.z, 0.f});
  uvs.insert(uvs.end(), {uv.x, uv.y});
  base_positions.push_back(v);
  base_normals.push_back(n);
  base_uvs.push_back(uv);
  joints.insert(joints.end(), j, j + 4);
  weights.insert(weights.end(), w, w + 4);
  return (uint32_t)(base_positions.size() - 1);
}

void Geometry::push_attributes(const Vec3& base_color, uint32_t mat,
                               float metallic, float roughness, float ior,
                               const Vec3& emissive, const float tex_indices[4],
                               float occlusion_tex) {
  const float rec[ATTR_STRIDE] = {
      base_color.x, base_color.y, base_color.z, (float)mat,
      metallic,     roughness,    ior,          0.f,
      tex_indices[0], tex_indices[1], tex_indices[2], tex_indices[3],
      emissive.x,   emissive.y,   emissive.z,   occlusion_tex,
  };
  attributes.insert(attributes.end(), rec, rec + ATTR_STRIDE);
}

void Geometry::simple_material(uint32_t mat, float extra, float* metallic,
                               float* roughness, float* ior) {
  switch (mat) {
    case mat_type::METAL:
      *metallic = 1.f; *roughness = extra; *ior = 1.5f;
      break;
    case mat_type::DIELECTRIC:
      *metallic = 0.f; *roughness = 0.f; *ior = extra;
      break;
    default:  // LAMBERTIAN / LIGHT
      *metallic = 0.f; *roughness = 1.f; *ior = 1.5f;
      break;
  }
}

Geometry Geometry::from_mesh(const Mesh& mesh) {
  Geometry geo;
  for (size_t i = 0; i < mesh.vertices.size(); ++i) {
    Vec3 n = i < mesh.normals.size() ? mesh.normals[i] : Vec3{0, 1, 0};
    Vec2 uv = i < mesh.uvs.size() ? mesh.uvs[i] : Vec2{0, 0};
    geo.push_vertex(mesh.vertices[i], n, uv);
  }
  const float no_tex[4] = {-1.f, -1.f, -1.f, -1.f};
  for (size_t t = 0; t + 2 < mesh.indices.size(); t += 3) {
    geo.indices.insert(geo.indices.end(),
                       {mesh.indices[t], mesh.indices[t + 1], mesh.indices[t + 2]});
    geo.push_attributes({1.f, 1.f, 1.f}, mat_type::LAMBERTIAN, 0.f, 1.f, 1.5f,
                        {0, 0, 0}, no_tex, -1.f);
  }
  return geo;
}

void Geometry::normalize_scale() {
  if (base_positions.empty()) return;
  Vec3 mn = Vec3::splat(std::numeric_limits<float>::infinity());
  Vec3 mx = Vec3::splat(-std::numeric_limits<float>::infinity());
  for (const Vec3& p : base_positions) {
    mn = mn.min(p);
    mx = mx.max(p);
  }
  Vec3 center = (mn + mx) * 0.5f;
  float max_dim = (mx - mn).max_element();
  if (max_dim < 1e-6f) return;
  float scale = 2.f / max_dim;
  for (size_t i = 0; i < base_positions.size(); ++i) {
    Vec3 p = (base_positions[i] - center) * scale;
    base_positions[i] = p;
    vertices[i * 4 + 0] = p.x;
    vertices[i * 4 + 1] = p.y;
    vertices[i * 4 + 2] = p.z;
  }
}

void Geometry::add_triangle(const Vec3& v0, const Vec3& v1, const Vec3& v2,
                            const Vec3& color, uint32_t mat, float extra,
                            float tex_index) {
  Vec3 n = (v1 - v0).cross(v2 - v0).normalized();
  uint32_t i0 = push_vertex(v0, n, {0, 0});
  uint32_t i1 = push_vertex(v1, n, {1, 0});
  uint32_t i2 = push_vertex(v2, n, {0, 1});
  indices.insert(indices.end(), {i0, i1, i2});
  float metallic, roughness, ior;
  simple_material(mat, extra, &metallic, &roughness, &ior);
  const float tex[4] = {tex_index, -1.f, -1.f, -1.f};
  push_attributes(color, mat, metallic, roughness, ior, {0, 0, 0}, tex, -1.f);
}

void Geometry::add_sphere(const Vec3& center, float radius, const Vec3& color,
                          uint32_t mat, float extra, float tex_index) {
  // 24x12 UV sphere, matching the reference tessellation (geometry.rs:204-275)
  // so preset scenes produce identical triangle sets.
  constexpr uint32_t sectors = 24;
  constexpr uint32_t stacks = 12;
  constexpr float PI = 3.14159265358979323846f;
  uint32_t start_index = (uint32_t)vertex_count();
  for (uint32_t i = 0; i <= stacks; ++i) {
    float v_coord = (float)i / stacks;
    float stack_angle = PI / 2.f - PI * v_coord;
    float xy = radius * std::cos(stack_angle);
    float z = radius * std::sin(stack_angle);
    for (uint32_t j = 0; j <= sectors; ++j) {
      float u_coord = (float)j / sectors;
      float sector_angle = 2.f * PI * u_coord;
      Vec3 p{xy * std::cos(sector_angle), xy * std::sin(sector_angle), z};
      push_vertex(p + center, p.normalized(), {u_coord, v_coord});
    }
  }
  float metallic, roughness, ior;
  simple_material(mat, extra, &metallic, &roughness, &ior);
  const float tex[4] = {tex_index, -1.f, -1.f, -1.f};
  for (uint32_t i = 0; i < stacks; ++i) {
    uint32_t k1 = start_index + i * (sectors + 1);
    uint32_t k2 = k1 + sectors + 1;
    for (uint32_t j = 0; j < sectors; ++j) {
      if (i != 0) {
        indices.insert(indices.end(), {k1 + j, k2 + j, k1 + j + 1});
        push_attributes(color, mat, metallic, roughness, ior, {0, 0, 0}, tex, -1.f);
      }
      if (i != stacks - 1) {
        indices.insert(indices.end(), {k1 + j + 1, k2 + j, k2 + j + 1});
        push_attributes(color, mat, metallic, roughness, ior, {0, 0, 0}, tex, -1.f);
      }
    }
  }
}

void Geometry::add_mesh_instance(const Mesh& mesh, const Vec3& pos, float scale,
                                 float rot_y_deg, const Vec3& color,
                                 uint32_t mat, float extra, float tex_index) {
  if (mesh.vertices.empty()) return;
  float rad = radians(rot_y_deg);
  float c = std::cos(rad), s = std::sin(rad);
  // Rotation about +Y (column-major 3x3 applied to scaled vertex).
  auto rot = [&](const Vec3& p) -> Vec3 {
    return {c * p.x + s * p.z, p.y, -s * p.x + c * p.z};
  };
  uint32_t start_offset = (uint32_t)vertex_count();
  for (size_t i = 0; i < mesh.vertices.size(); ++i) {
    Vec3 tv = rot(mesh.vertices[i] * scale) + pos;
    Vec3 tn = i < mesh.normals.size() ? rot(mesh.normals[i]) : Vec3{0, 1, 0};
    Vec2 uv = i < mesh.uvs.size() ? mesh.uvs[i] : Vec2{0, 0};
    push_vertex(tv, tn, uv);
  }
  float metallic, roughness, ior;
  simple_material(mat, extra, &metallic, &roughness, &ior);
  const float tex[4] = {tex_index, -1.f, -1.f, -1.f};
  for (size_t t = 0; t + 2 < mesh.indices.size(); t += 3) {
    indices.insert(indices.end(), {mesh.indices[t] + start_offset,
                                   mesh.indices[t + 1] + start_offset,
                                   mesh.indices[t + 2] + start_offset});
    push_attributes(color, mat, metallic, roughness, ior, {0, 0, 0}, tex, -1.f);
  }
}

}  // namespace wrt
