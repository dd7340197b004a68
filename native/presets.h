// Procedural scene presets + quad/box helpers.
// Capability parity: reference rust-shader-tools/src/scene/{procedural,helpers,factory}.rs.
#pragma once
#include <string>

#include "geometry.h"
#include "mesh_obj.h"
#include "scene_types.h"

namespace wrt {

// Quad a-b-c-d (two triangles a-b-c, a-c-d) with auto UVs; normal from
// (b-a)x(d-a). (reference scene/helpers.rs:6-53)
void add_quad(Geometry& geom, const Vec3& a, const Vec3& b, const Vec3& c,
              const Vec3& d, const Vec3& color, uint32_t mat, float extra,
              float tex_index);

// Y-rotated box from 6 quads (reference scene/helpers.rs:55-151).
void create_box(Geometry& geom, const Vec3& size, const Vec3& center,
                float rot_y_deg, const Vec3& color, uint32_t mat, float extra,
                float tex_index);

// Preset factory (reference scene/factory.rs:5-14):
// cornell | spheres | mixed | special | mesh | viewer (default: cornell).
SceneData get_scene_data(const std::string& name, const Mesh* loaded_mesh,
                         bool has_glb);

}  // namespace wrt
