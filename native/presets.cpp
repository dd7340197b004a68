#include "presets.h"

#include <cmath>

namespace wrt {

namespace {
constexpr float PI = 3.14159265358979323846f;

// Deterministic LCG for the `spheres` preset. The reference uses the rand
// crate (non-reproducible across loads, helpers.rs:154-162); a fixed seed
// keeps our golden-image tests stable while producing the same distribution.
struct Rng {
  uint64_t state = 0x853c49e6748fea9bULL;
  float next() {
    state = state * 6364136223846793005ULL + 1442695040888963407ULL;
    return (float)((state >> 33) & 0xFFFFFF) / (float)0x1000000;
  }
  float range(float lo, float hi) { return lo + (hi - lo) * next(); }
};

std::vector<SceneInstance> identity_instance() {
  return {SceneInstance{Mat4::identity(), 0}};
}

}  // namespace

void add_quad(Geometry& geom, const Vec3& a, const Vec3& b, const Vec3& c,
              const Vec3& d, const Vec3& color, uint32_t mat, float extra,
              float tex_index) {
  Vec3 n = (b - a).cross(d - a).normalized();
  uint32_t i0 = geom.push_vertex(a, n, {0, 0});
  uint32_t i1 = geom.push_vertex(b, n, {1, 0});
  uint32_t i2 = geom.push_vertex(c, n, {1, 1});
  uint32_t i3 = geom.push_vertex(d, n, {0, 1});

  float metallic, roughness, ior;
  Geometry::simple_material(mat, extra, &metallic, &roughness, &ior);
  const float tex[4] = {tex_index, -1.f, -1.f, -1.f};

  geom.indices.insert(geom.indices.end(), {i0, i1, i2});
  geom.push_attributes(color, mat, metallic, roughness, ior, {0, 0, 0}, tex, -1.f);
  geom.indices.insert(geom.indices.end(), {i0, i2, i3});
  geom.push_attributes(color, mat, metallic, roughness, ior, {0, 0, 0}, tex, -1.f);
}

void create_box(Geometry& geom, const Vec3& size, const Vec3& center,
                float rot_y_deg, const Vec3& color, uint32_t mat, float extra,
                float tex_index) {
  float rad = radians(rot_y_deg);
  float cos_r = std::cos(rad), sin_r = std::sin(rad);
  auto tf = [&](const Vec3& p) -> Vec3 {
    return Vec3{p.x * cos_r + p.z * sin_r, p.y, -p.x * sin_r + p.z * cos_r} + center;
  };
  Vec3 dx{size.x / 2.f, 0, 0}, dy{0, size.y / 2.f, 0}, dz{0, 0, size.z / 2.f};

  // Front / Back / Top / Bottom / Right / Left, same winding as the reference.
  add_quad(geom, tf(-dx - dy + dz), tf(dx - dy + dz), tf(dx + dy + dz), tf(-dx + dy + dz), color, mat, extra, tex_index);
  add_quad(geom, tf(dx - dy - dz), tf(-dx - dy - dz), tf(-dx + dy - dz), tf(dx + dy - dz), color, mat, extra, tex_index);
  add_quad(geom, tf(-dx + dy + dz), tf(dx + dy + dz), tf(dx + dy - dz), tf(-dx + dy - dz), color, mat, extra, tex_index);
  add_quad(geom, tf(-dx - dy - dz), tf(dx - dy - dz), tf(dx - dy + dz), tf(-dx - dy + dz), color, mat, extra, tex_index);
  add_quad(geom, tf(dx - dy + dz), tf(dx - dy - dz), tf(dx + dy - dz), tf(dx + dy + dz), color, mat, extra, tex_index);
  add_quad(geom, tf(-dx - dy - dz), tf(-dx - dy + dz), tf(-dx + dy + dz), tf(-dx + dy - dz), color, mat, extra, tex_index);
}

namespace {

// --- Cornell box (reference procedural.rs:16-171) ---
SceneData create_cornell_box(const Mesh* loaded_mesh) {
  Geometry geom;
  Vec3 white{0.73f, 0.73f, 0.73f};
  Vec3 red{0.65f, 0.05f, 0.05f};
  Vec3 green{0.12f, 0.45f, 0.15f};
  Vec3 light{20.f, 20.f, 20.f};

  const float s = 555.f;
  auto v = [&](float x, float y, float z) {
    return Vec3{x / s * 2.f - 1.f, y / s * 2.f, z / s * 2.f - 1.f};
  };
  auto sz = [&](float x, float y, float z) {
    return Vec3{x / s * 2.f, y / s * 2.f, z / s * 2.f};
  };

  // floor, ceiling, back, green, red walls; ceiling light quad
  add_quad(geom, v(0, 0, 0), v(555, 0, 0), v(555, 0, 555), v(0, 0, 555), white, mat_type::LAMBERTIAN, 0.f, -1.f);
  add_quad(geom, v(0, 555, 0), v(0, 555, 555), v(555, 555, 555), v(555, 555, 0), white, mat_type::LAMBERTIAN, 0.f, -1.f);
  add_quad(geom, v(0, 0, 555), v(555, 0, 555), v(555, 555, 555), v(0, 555, 555), white, mat_type::LAMBERTIAN, 0.f, -1.f);
  add_quad(geom, v(0, 0, 0), v(0, 555, 0), v(0, 555, 555), v(0, 0, 555), green, mat_type::LAMBERTIAN, 0.f, -1.f);
  add_quad(geom, v(555, 0, 0), v(555, 0, 555), v(555, 555, 555), v(555, 555, 0), red, mat_type::LAMBERTIAN, 0.f, -1.f);
  add_quad(geom, v(213, 554, 227), v(343, 554, 227), v(343, 554, 332), v(213, 554, 332), light, mat_type::LIGHT, 0.f, -1.f);

  SceneData data;
  if (loaded_mesh) {
    Geometry mesh_geo = Geometry::from_mesh(*loaded_mesh);
    mesh_geo.normalize_scale();
    data.geometries = {std::move(geom), std::move(mesh_geo)};
    data.instances = {
        SceneInstance{Mat4::identity(), 0},
        SceneInstance{Mat4::from_translation({0.f, 1.f, 0.f}) *
                          Mat4::from_scale(Vec3::splat(2.f)),
                      1},
    };
    data.camera = {{0.f, 1.f, -1.f}, {0.f, 1.f, 0.f}, {0.f, 1.f, 0.f}, 60.f, 0.f, 2.4f};
    return data;
  }

  create_box(geom, sz(165, 330, 165), v(297.5f, 165, 378.5f), -15.f, white, mat_type::LAMBERTIAN, 0.f, -1.f);
  create_box(geom, sz(165, 165, 165), v(232.5f, 82.5f, 147.5f), 18.f, white, mat_type::LAMBERTIAN, 0.f, -1.f);

  data.camera = {{0.f, 1.f, -2.4f}, {0.f, 1.f, 0.f}, {0.f, 1.f, 0.f}, 60.f, 0.f, 2.4f};
  data.geometries.push_back(std::move(geom));
  data.instances = identity_instance();
  return data;
}

// --- RTiOW random spheres (reference procedural.rs:174-279) ---
SceneData create_random_spheres() {
  Geometry geom;
  Rng rng;

  geom.add_sphere({0, -1000, 0}, 1000.f, {0.5f, 0.5f, 0.5f}, mat_type::LAMBERTIAN, 0.f, -1.f);
  geom.add_sphere({-50, 50, -50}, 30.f, {3.f, 2.7f, 2.7f}, mat_type::LIGHT, 0.f, -1.f);

  for (int a = -11; a < 11; ++a) {
    for (int b = -11; b < 11; ++b) {
      float choose_mat = rng.next();
      Vec3 center{(float)a + 0.9f * rng.next(), 0.2f, (float)b + 0.9f * rng.next()};
      if ((center - Vec3{4.f, 0.2f, 0.f}).length() > 0.9f) {
        if (choose_mat < 0.8f) {
          float r = rng.next(), g = rng.next(), bl = rng.next();
          geom.add_sphere(center, 0.2f, {r * r, g * g, bl * bl}, mat_type::LAMBERTIAN, 0.f, -1.f);
        } else if (choose_mat < 0.95f) {
          Vec3 col{rng.range(0.5f, 1.f), rng.range(0.5f, 1.f), rng.range(0.5f, 1.f)};
          geom.add_sphere(center, 0.2f, col, mat_type::METAL, rng.range(0.f, 0.5f), -1.f);
        } else {
          geom.add_sphere(center, 0.2f, {1, 1, 1}, mat_type::DIELECTRIC, 1.5f, -1.f);
        }
      }
    }
  }

  geom.add_sphere({0, 1, 0}, 1.f, {1, 1, 1}, mat_type::DIELECTRIC, 1.5f, -1.f);
  geom.add_sphere({-4, 1, 0}, 1.f, {0.4f, 0.2f, 0.1f}, mat_type::LAMBERTIAN, 0.f, -1.f);
  geom.add_sphere({4, 1, 0}, 1.f, {0.7f, 0.6f, 0.5f}, mat_type::METAL, 0.f, -1.f);

  SceneData data;
  data.camera = {{13.f, 2.f, 3.f}, {0, 0, 0}, {0, 1, 0}, 20.f, 0.6f, 10.f};
  data.geometries.push_back(std::move(geom));
  data.instances = identity_instance();
  return data;
}

// --- Mixed scene (reference procedural.rs:282-425) ---
SceneData create_mixed_scene() {
  Geometry geom;

  create_box(geom, {40, 2, 40}, {0, -1.f, 0}, 0.f, {0.1f, 0.1f, 0.1f}, mat_type::METAL, 0.05f, -1.f);

  Vec3 warm{40.f, 30.f, 10.f};
  Vec3 la{-4.f, 8.f, 4.f};
  add_quad(geom, la, la + Vec3{2, 0, 0}, la + Vec3{2, 0, 2}, la + Vec3{0, 0, 2}, warm, mat_type::LIGHT, 0.f, -1.f);

  Vec3 cool{5.f, 10.f, 20.f};
  Vec3 lb{4.f, 6.f, -4.f};
  add_quad(geom, lb, lb + Vec3{3, 0, 0}, lb + Vec3{3, -3, 0}, lb + Vec3{0, -3, 0}, cool, mat_type::LIGHT, 0.f, -1.f);

  create_box(geom, {2, 1, 2}, {0, 0.5f, 0}, 0.f, {0.8f, 0.6f, 0.2f}, mat_type::METAL, 0.1f, -1.f);
  geom.add_sphere({0, 1.8f, 0}, 0.8f, {1, 1, 1}, mat_type::DIELECTRIC, 1.5f, -1.f);
  geom.add_sphere({0, 1.8f, 0}, -0.7f, {1, 1, 1}, mat_type::DIELECTRIC, 1.0f, -1.f);
  create_box(geom, {0.8f, 0.8f, 0.8f}, {0, 3.2f, 0}, 15.f, {0.9f, 0.1f, 0.1f}, mat_type::METAL, 0.2f, -1.f);

  for (int i = 0; i < 12; ++i) {
    float fi = (float)i;
    float angle = fi / 12.f * PI * 2.f;
    Vec3 pos{std::cos(angle) * 4.f, 1.f + std::sin(angle * 3.f) * 0.5f, std::sin(angle) * 4.f};
    if (i % 2 == 0) {
      geom.add_sphere(pos, 0.4f, {0.8f, 0.8f, 0.8f}, mat_type::METAL, 0.f, -1.f);
    } else {
      Vec3 col{0.5f + 0.5f * std::cos(fi), 0.5f + 0.5f * std::sin(fi), 0.8f};
      create_box(geom, {0.6f, 0.6f, 0.6f}, pos, fi * 20.f, col, mat_type::LAMBERTIAN, 0.f, -1.f);
    }
  }

  create_box(geom, {1, 6, 1}, {-4, 3, -6}, 10.f, {0.2f, 0.2f, 0.3f}, mat_type::LAMBERTIAN, 0.f, -1.f);
  create_box(geom, {1, 4, 1}, {4, 2, -5}, -20.f, {0.2f, 0.2f, 0.3f}, mat_type::LAMBERTIAN, 0.f, -1.f);

  SceneData data;
  data.camera = {{0.f, 3.5f, 9.f}, {0.f, 1.5f, 0.f}, {0, 1, 0}, 40.f, 0.3f, 9.f};
  data.geometries.push_back(std::move(geom));
  data.instances = identity_instance();
  return data;
}

// --- Special Cornell (glass tall box) (reference procedural.rs:428-553) ---
SceneData create_cornell_box_special() {
  Geometry geom;
  Vec3 white{0.73f, 0.73f, 0.73f};
  Vec3 red{0.65f, 0.05f, 0.05f};
  Vec3 green{0.12f, 0.45f, 0.15f};
  Vec3 light{10.f, 10.f, 10.f};

  const float s = 555.f;
  auto v = [&](float x, float y, float z) {
    return Vec3{x / s * 2.f - 1.f, y / s * 2.f, z / s * 2.f - 1.f};
  };
  auto sz = [&](float x, float y, float z) {
    return Vec3{x / s * 2.f, y / s * 2.f, z / s * 2.f};
  };

  add_quad(geom, v(0, 0, 0), v(555, 0, 0), v(555, 0, 555), v(0, 0, 555), white, mat_type::METAL, 0.1f, -1.f);
  add_quad(geom, v(0, 555, 0), v(0, 555, 555), v(555, 555, 555), v(555, 555, 0), white, mat_type::LAMBERTIAN, 0.f, -1.f);
  add_quad(geom, v(0, 0, 555), v(555, 0, 555), v(555, 555, 555), v(0, 555, 555), white, mat_type::LAMBERTIAN, 0.f, -1.f);
  add_quad(geom, v(0, 0, 0), v(0, 555, 0), v(0, 555, 555), v(0, 0, 555), green, mat_type::LAMBERTIAN, 0.f, -1.f);
  add_quad(geom, v(555, 0, 0), v(555, 0, 555), v(555, 555, 555), v(555, 555, 0), red, mat_type::LAMBERTIAN, 0.f, -1.f);
  add_quad(geom, v(213, 554, 227), v(343, 554, 227), v(343, 554, 332), v(213, 554, 332), light, mat_type::LIGHT, 0.f, -1.f);

  Vec3 tall_pos = v(366, 165, 383);
  create_box(geom, sz(165, 330, 165), tall_pos, 15.f, {0.95f, 0.95f, 0.95f}, mat_type::DIELECTRIC, 1.5f, -1.f);
  Vec3 short_pos = v(183, 82.5f, 209);
  create_box(geom, sz(165, 165, 165), short_pos, -18.f, white, mat_type::METAL, 0.2f, -1.f);
  geom.add_sphere(tall_pos, 60.f / s, {0.1f, 0.1f, 10.f}, mat_type::LIGHT, 0.f, -1.f);

  SceneData data;
  data.camera = {{0.f, 1.f, -3.9f}, {0.f, 1.f, 0.f}, {0, 1, 0}, 40.f, 0.f, 2.4f};
  data.geometries.push_back(std::move(geom));
  data.instances = identity_instance();
  return data;
}

// --- Mesh (cube OBJ instancing demo) (reference procedural.rs:556-630) ---
constexpr const char* CUBE_OBJ =
    "v -1 -1 1\nv 1 -1 1\nv -1 1 1\nv 1 1 1\nv -1 -1 -1\nv 1 -1 -1\nv -1 1 -1\n"
    "v 1 1 -1\nf 1 2 4 3\nf 3 4 8 7\nf 7 8 6 5\nf 5 6 2 1\nf 3 7 5 1\nf 8 4 2 6";

SceneData create_mesh_scene() {
  Geometry geom;
  Mesh mesh = Mesh::parse(CUBE_OBJ);

  geom.add_sphere({0, -1000, 0}, 1000.f, {0.5f, 0.5f, 0.5f}, mat_type::LAMBERTIAN, 0.f, -1.f);
  geom.add_mesh_instance(mesh, {-2, 1, 0}, 1.f, 45.f, {0.8f, 0.2f, 0.2f}, mat_type::METAL, 0.2f, -1.f);
  geom.add_mesh_instance(mesh, {0, 1, 1.5f}, 1.2f, 0.f, {1, 1, 1}, mat_type::DIELECTRIC, 1.5f, -1.f);
  for (int i = 0; i < 5; ++i) {
    float fi = (float)i;
    geom.add_mesh_instance(mesh, {2.f + fi * 0.5f, 0.5f + fi * 0.5f, -fi}, 0.5f,
                           fi * 30.f, {0.2f, 0.4f, 0.8f}, mat_type::LAMBERTIAN, 0.f, -1.f);
  }
  geom.add_sphere({0, 10, 0}, 3.f, {10, 10, 10}, mat_type::LIGHT, 0.f, -1.f);

  SceneData data;
  data.camera = {{0.f, 3.f, 6.f}, {0.f, 1.f, 0.f}, {0, 1, 0}, 40.f, 0.f, 6.f};
  data.geometries.push_back(std::move(geom));
  data.instances = identity_instance();
  return data;
}

// --- Viewer: Cornell environment + model slot (reference procedural.rs:634-791) ---
SceneData create_model_viewer_scene(const Mesh* mesh, bool has_glb) {
  Geometry geom_env;
  Vec3 white{0.73f, 0.73f, 0.73f};
  Vec3 red{0.65f, 0.05f, 0.05f};
  Vec3 green{0.12f, 0.45f, 0.15f};
  Vec3 light{10.f, 10.f, 10.f};

  const float s = 555.f;
  auto v = [&](float x, float y, float z) {
    return Vec3{x / s * 2.f - 1.f, y / s * 2.f, z / s * 2.f - 1.f};
  };

  add_quad(geom_env, v(0, 0, 0), v(555, 0, 0), v(555, 0, 555), v(0, 0, 555), white, mat_type::METAL, 0.15f, -1.f);
  add_quad(geom_env, v(0, 555, 0), v(0, 555, 555), v(555, 555, 555), v(555, 555, 0), white, mat_type::LAMBERTIAN, 0.f, -1.f);
  add_quad(geom_env, v(0, 0, 555), v(555, 0, 555), v(555, 555, 555), v(0, 555, 555), white, mat_type::LAMBERTIAN, 0.f, -1.f);
  add_quad(geom_env, v(0, 0, 0), v(0, 555, 0), v(0, 555, 555), v(0, 0, 555), green, mat_type::LAMBERTIAN, 0.f, -1.f);
  add_quad(geom_env, v(555, 0, 0), v(555, 0, 555), v(555, 555, 555), v(555, 555, 0), red, mat_type::LAMBERTIAN, 0.f, -1.f);
  add_quad(geom_env, v(150, 554, 150), v(405, 554, 150), v(405, 554, 405), v(150, 554, 405), light, mat_type::LIGHT, 0.f, -1.f);

  Geometry geom_model;
  bool should_add_dummy = (mesh == nullptr) && !has_glb;
  if (mesh) {
    geom_model.add_mesh_instance(*mesh, {0, 1, 0}, 1.f, 0.f, {0.8f, 0.8f, 0.8f},
                                 mat_type::LAMBERTIAN, 0.f, -1.f);
  } else if (should_add_dummy) {
    geom_model.add_sphere({0, 1, 0}, 0.5f, {1, 0, 1}, mat_type::LAMBERTIAN, 0.f, -1.f);
  }

  SceneData data;
  data.instances.push_back(SceneInstance{Mat4::identity(), 0});
  if (!geom_model.vertices.empty()) {
    data.instances.push_back(SceneInstance{Mat4::identity(), 1});
  }
  data.camera = {{0.f, 1.f, -3.9f}, {0.f, 1.f, 0.f}, {0, 1, 0}, 40.f, 0.f, 3.9f};
  data.geometries.push_back(std::move(geom_env));
  data.geometries.push_back(std::move(geom_model));
  return data;
}

}  // namespace

SceneData get_scene_data(const std::string& name, const Mesh* loaded_mesh,
                         bool has_glb) {
  if (name == "spheres") return create_random_spheres();
  if (name == "mixed") return create_mixed_scene();
  if (name == "special") return create_cornell_box_special();
  if (name == "mesh") return create_mesh_scene();
  if (name == "viewer") return create_model_viewer_scene(loaded_mesh, has_glb);
  return create_cornell_box(loaded_mesh);  // "cornell" and default
}

}  // namespace wrt
