// C ABI for the scene compiler, consumed from Python via ctypes
// (webgpu_raytracer_tpu/models/native.py). Mirrors the wasm-bindgen surface of
// the reference World (rust-shader-tools/src/lib.rs:26-368).
#include <cstdint>
#include <cstring>
#include <string>

#include "world.h"

using wrt::World;

extern "C" {

World* wrt_world_create(const char* scene_name, const char* obj_source,
                        const uint8_t* glb_data, size_t glb_len) {
  try {
    std::string name = scene_name ? scene_name : "cornell";
    std::string obj;
    const std::string* obj_ptr = nullptr;
    if (obj_source) {
      obj = obj_source;
      obj_ptr = &obj;
    }
    return new World(name, obj_ptr, glb_data, glb_len);
  } catch (...) {
    return nullptr;
  }
}

void wrt_world_destroy(World* w) { delete w; }

void wrt_world_update(World* w, float time) { w->update(time); }

void wrt_world_update_camera(World* w, float width, float height) {
  w->update_camera(width, height);
}

size_t wrt_world_animation_count(World* w) { return w->animation_count(); }

const char* wrt_world_animation_name(World* w, size_t i) {
  return w->animation_name(i).c_str();
}

void wrt_world_set_animation(World* w, size_t i) { w->set_animation(i); }

int wrt_world_load_animation_glb(World* w, const uint8_t* data, size_t len) {
  return w->load_animation_glb(data, len) ? 1 : 0;
}

#define WRT_BUFFER_ACCESSOR(name, member, type)              \
  const type* wrt_world_##name(World* w, size_t* len) {      \
    const auto& v = w->buffers().member;                     \
    *len = v.size();                                         \
    return v.empty() ? nullptr : v.data();                   \
  }

WRT_BUFFER_ACCESSOR(tlas, tlas_nodes, float)
WRT_BUFFER_ACCESSOR(blas, blas_nodes, float)
WRT_BUFFER_ACCESSOR(instances, instances, float)
WRT_BUFFER_ACCESSOR(vertices, vertices, float)
WRT_BUFFER_ACCESSOR(normals, normals, float)
WRT_BUFFER_ACCESSOR(uvs, uvs, float)
WRT_BUFFER_ACCESSOR(camera, camera_data, float)
WRT_BUFFER_ACCESSOR(topology, mesh_topology, uint32_t)
WRT_BUFFER_ACCESSOR(lights, lights, uint32_t)
WRT_BUFFER_ACCESSOR(draw_commands, draw_commands, uint32_t)

#undef WRT_BUFFER_ACCESSOR

size_t wrt_world_texture_count(World* w) { return w->texture_count(); }

const uint8_t* wrt_world_texture(World* w, size_t i, size_t* len) {
  if (i >= w->texture_count()) {
    *len = 0;
    return nullptr;
  }
  const auto& t = w->texture(i);
  *len = t.size();
  return t.empty() ? nullptr : t.data();
}

}  // extern "C"
