#include "world.h"

#include <cmath>
#include <cstring>

#include "bvh.h"
#include "gltf.h"
#include "mesh_obj.h"
#include "presets.h"

namespace wrt {

namespace {
inline uint32_t f32_to_bits(float f) {
  uint32_t u;
  std::memcpy(&u, &f, 4);
  return u;
}
inline float bits_to_f32(uint32_t u) {
  float f;
  std::memcpy(&f, &u, 4);
  return f;
}
}  // namespace

World::World(const std::string& scene_name, const std::string* obj_source,
             const uint8_t* glb_data, size_t glb_len) {
  Mesh loaded_mesh;
  bool has_mesh = false;
  if (obj_source) {
    loaded_mesh = Mesh::parse(*obj_source);
    has_mesh = true;
  }
  bool has_glb = glb_data != nullptr && glb_len > 0;

  scene_ = get_scene_data(scene_name, has_mesh ? &loaded_mesh : nullptr, has_glb);

  if (has_glb) {
    load_gltf(scene_.geometries, scene_.instances, scene_.nodes, scene_.skins,
              scene_.animations, scene_.textures, glb_data, glb_len);
  }

  for (const SceneInstance& si : scene_.instances) {
    Instance inst;
    inst.transform = si.transform;
    inst.inverse_transform = si.transform.inverse();
    inst.instance_id = (uint32_t)si.geometry_index;
    raw_instances_.push_back(inst);
    instance_blas_aabbs_.push_back(AABB::empty());
  }
  if (raw_instances_.empty()) {
    raw_instances_.push_back(Instance{});
    instance_blas_aabbs_.push_back(AABB::empty());
  }

  update(0.f);
}

const std::string& World::animation_name(size_t i) const {
  static const std::string empty;
  return i < scene_.animations.size() ? scene_.animations[i].name : empty;
}

void World::set_animation(size_t i) {
  if (i < scene_.animations.size()) active_anim_index_ = i;
}

bool World::load_animation_glb(const uint8_t* data, size_t len) {
  std::vector<Geometry> tmp_geoms;
  std::vector<SceneInstance> tmp_insts;
  std::vector<Node> tmp_nodes;
  std::vector<Skin> tmp_skins;
  std::vector<Animation> new_anims;
  std::vector<std::vector<uint8_t>> new_tex;
  if (!load_gltf(tmp_geoms, tmp_insts, tmp_nodes, tmp_skins, new_anims, new_tex,
                 data, len)) {
    return false;
  }
  for (Animation& a : new_anims) scene_.animations.push_back(std::move(a));
  return true;
}

void World::update_camera(float width, float height) {
  if (height == 0.f) return;
  buffers_.camera_data.resize(24);
  scene_.camera.create_buffer(width / height, buffers_.camera_data.data());
}

void World::update(float time) {
  // 1. Animation sample
  if (!scene_.animations.empty()) {
    size_t anim_idx = active_anim_index_ < scene_.animations.size()
                          ? active_anim_index_
                          : 0;
    float duration = scene_.animations[anim_idx].duration;
    float t = duration > 0.001f ? std::fmod(time, duration) : 0.f;
    apply_animation(anim_idx, t);
  }

  // 2. Scene-graph flatten (TRS -> global matrices from roots)
  size_t node_count = scene_.nodes.size();
  std::vector<Mat4> globals(node_count, Mat4::identity());
  for (size_t i = 0; i < node_count; ++i) {
    if (!scene_.nodes[i].parent_index.has_value()) {
      update_node_global(i, Mat4::identity(), globals);
    }
  }
  for (size_t i = 0; i < node_count; ++i) {
    scene_.nodes[i].global_transform = globals[i];
  }

  // 3. Rebuild geometry: skinning + per-geometry BLAS + topology packing
  std::vector<std::vector<uint32_t>> emissive_lists;
  std::vector<std::pair<uint32_t, uint32_t>> geom_ranges;
  rebuild_geometry(globals, emissive_lists, geom_ranges);

  // 4. Instance refresh: BLAS root offsets + root AABBs.
  // Instances beyond index 0 get the demo model transform (0.7 scale + 180deg
  // Y rotation), matching reference lib.rs:196-204.
  for (size_t i = 0; i < raw_instances_.size(); ++i) {
    Instance& inst = raw_instances_[i];
    if (i > 0) {
      Mat4 model = Mat4::from_rotation_y(3.14159265358979323846f) *
                   Mat4::from_scale(Vec3::splat(0.7f));
      inst.transform = model;
      inst.inverse_transform = model.inverse();
    }
    size_t geom_idx = inst.instance_id;
    if (geom_idx < blas_root_offsets_.size()) {
      inst.blas_node_offset = blas_root_offsets_[geom_idx];
      size_t base = (size_t)inst.blas_node_offset * 8;
      if (base < buffers_.blas_nodes.size()) {
        instance_blas_aabbs_[i].min = {buffers_.blas_nodes[base],
                                       buffers_.blas_nodes[base + 1],
                                       buffers_.blas_nodes[base + 2]};
        instance_blas_aabbs_[i].max = {buffers_.blas_nodes[base + 4],
                                       buffers_.blas_nodes[base + 5],
                                       buffers_.blas_nodes[base + 6]};
      }
    }
  }

  // 5. TLAS rebuild (full rebuild each tick = the refit mechanism)
  TlasBuilder tlas_builder(raw_instances_, instance_blas_aabbs_);
  buffers_.tlas_nodes.clear();
  std::vector<Instance> sorted_insts;
  tlas_builder.build(buffers_.tlas_nodes, sorted_insts);

  // 6. Emit draw commands + lights in TLAS-sorted instance order
  buffers_.draw_commands.clear();
  buffers_.lights.clear();
  for (size_t i = 0; i < sorted_insts.size(); ++i) {
    const Instance& inst = sorted_insts[i];
    size_t geom_idx = inst.instance_id;
    uint32_t v_count = 0, v_start = 0;
    if (geom_idx < blas_root_offsets_.size()) {
      if (geom_idx < geom_ranges.size()) {
        v_count = geom_ranges[geom_idx].second * 3;
        v_start = geom_ranges[geom_idx].first * 3;
      }
      if (geom_idx < emissive_lists.size()) {
        for (uint32_t tri : emissive_lists[geom_idx]) {
          buffers_.lights.push_back((uint32_t)i);
          buffers_.lights.push_back(tri);
        }
      }
    }
    buffers_.draw_commands.push_back(v_count);
    buffers_.draw_commands.push_back(1);
    buffers_.draw_commands.push_back(v_start);
    buffers_.draw_commands.push_back((uint32_t)i);
  }

  // 7. Pack instances to 36-f32 records (mat4 cols, inv cols, u32 meta bits)
  buffers_.instances.clear();
  buffers_.instances.reserve(sorted_insts.size() * 36);
  for (const Instance& inst : sorted_insts) {
    for (int c = 0; c < 4; ++c)
      for (int r = 0; r < 4; ++r) buffers_.instances.push_back(inst.transform.m[c][r]);
    for (int c = 0; c < 4; ++c)
      for (int r = 0; r < 4; ++r)
        buffers_.instances.push_back(inst.inverse_transform.m[c][r]);
    buffers_.instances.push_back(bits_to_f32(inst.blas_node_offset));
    buffers_.instances.push_back(bits_to_f32(inst.attr_offset));
    buffers_.instances.push_back(bits_to_f32(inst.instance_id));
    buffers_.instances.push_back(bits_to_f32(inst.pad));
  }
}

void World::refit_cached_blas(GeomCache& cache) {
  // Bottom-up AABB refit over the skip-pointer pre-order layout: children
  // appear after their parent (first child = i+1, second child = the first
  // child's skip pointer), so a reverse pass sees both children refit
  // before the parent. Leaf order / skips / data stay fixed — the BLAS
  // still exactly bounds the (re-skinned) leaf triangles, so traversal
  // results are identical to a fresh build over the same leaf sets.
  size_t n = cache.nodes.size() / 8;
  const std::vector<float>& v = cache.v_vec4;
  for (size_t ii = n; ii-- > 0;) {
    float* nd = &cache.nodes[ii * 8];
    uint32_t data = f32_to_bits(nd[7]);
    AABB box = AABB::empty();
    if (data != 0) {
      uint32_t first = data >> 3;
      uint32_t cnt = data & 7;
      for (uint32_t t = first; t < first + cnt; ++t) {
        for (int k = 0; k < 3; ++k) {
          uint32_t vi = cache.topo[(size_t)t * 20 + k];
          box.grow(Vec3{v[vi * 4], v[vi * 4 + 1], v[vi * 4 + 2]});
        }
      }
    } else {
      size_t c1 = ii + 1;
      size_t c2 = f32_to_bits(cache.nodes[c1 * 8 + 3]);
      for (size_t c : {c1, c2}) {
        const float* cn = &cache.nodes[c * 8];
        box.grow(Vec3{cn[0], cn[1], cn[2]});
        box.grow(Vec3{cn[4], cn[5], cn[6]});
      }
    }
    nd[0] = box.min.x;
    nd[1] = box.min.y;
    nd[2] = box.min.z;
    nd[4] = box.max.x;
    nd[5] = box.max.y;
    nd[6] = box.max.z;
  }
}

void World::rebuild_geometry(
    const std::vector<Mat4>& globals,
    std::vector<std::vector<uint32_t>>& emissive_lists,
    std::vector<std::pair<uint32_t, uint32_t>>& geom_ranges) {
  buffers_.clear_geometry();
  blas_root_offsets_.clear();
  emissive_lists.clear();
  geom_ranges.clear();
  geom_cache_.resize(scene_.geometries.size());

  uint32_t current_node_offset = 0;

  for (size_t geom_idx = 0; geom_idx < scene_.geometries.size(); ++geom_idx) {
    const Geometry& geom = scene_.geometries[geom_idx];
    if (geom.base_positions.empty()) {
      blas_root_offsets_.push_back(0);
      emissive_lists.emplace_back();
      geom_ranges.emplace_back(0, 0);
      continue;
    }

    const Skin* skin = nullptr;
    if (geom.skin_index.has_value() && *geom.skin_index < scene_.skins.size()) {
      skin = &scene_.skins[*geom.skin_index];
    }

    GeomCache& cache = geom_cache_[geom_idx];
    size_t vcount = geom.base_positions.size();

    if (!cache.valid || skin) {
      // (Re-)skin into the cache's local vertex arrays. Linear-blend
      // skinning, 4 joints/vertex, NaN-sanitized (reference
      // rebuilder.rs:50-89). Non-skinned geometries take this path once.
      cache.v_vec4.clear();
      cache.n_vec4.clear();
      cache.v_vec4.reserve(vcount * 4);
      cache.n_vec4.reserve(vcount * 4);
      bool fill_uv = !cache.valid;
      if (fill_uv) {
        cache.uv_vec2.clear();
        cache.uv_vec2.reserve(vcount * 2);
      }
      std::vector<Mat4> joint_mats;
      if (skin) {
        joint_mats.resize(skin->joints.size());
        for (size_t j = 0; j < skin->joints.size(); ++j) {
          joint_mats[j] =
              globals[skin->joints[j]] * skin->inverse_bind_matrices[j];
        }
      }
      for (size_t i = 0; i < vcount; ++i) {
        Vec3 p = geom.base_positions[i];
        Vec3 n = geom.base_normals[i];
        if (skin) {
          Mat4 mat = Mat4::zero();
          bool any = false;
          for (int k = 0; k < 4; ++k) {
            float w = geom.weights[i * 4 + k];
            if (w > 0.f) {
              mat = mat + joint_mats[geom.joints[i * 4 + k]] * w;
              any = true;
            }
          }
          if (!any) mat = Mat4::identity();
          p = mat.transform_point(p);
          n = mat.transform_vector(n).normalized();
        }
        if (p.is_nan()) p = {0, 0, 0};
        if (n.is_nan()) n = {0, 0, 1};
        cache.v_vec4.insert(cache.v_vec4.end(), {p.x, p.y, p.z, 1.f});
        cache.n_vec4.insert(cache.n_vec4.end(), {n.x, n.y, n.z, 0.f});
        if (fill_uv) {
          Vec2 uv = i < geom.base_uvs.size() ? geom.base_uvs[i] : Vec2{0, 0};
          cache.uv_vec2.insert(cache.uv_vec2.end(), {uv.x, uv.y});
        }
      }
    }

    if (!cache.valid) {
      // First build: binned-SAH BLAS + LOCAL topology/emissive records.
      // The leaf order fixed here persists for the geometry's lifetime
      // (skinned ticks refit AABBs over the same leaves instead of
      // re-running SAH — see refit_cached_blas).
      BlasBuilder builder(cache.v_vec4, geom.indices);
      std::vector<uint32_t> sorted_indices, tri_ids;
      cache.nodes.clear();
      builder.build(cache.nodes, sorted_indices, tri_ids);

      cache.topo.clear();
      cache.topo.reserve(tri_ids.size() * 20);
      cache.emissive.clear();
      for (size_t i = 0; i < tri_ids.size(); ++i) {
        cache.topo.push_back(sorted_indices[i * 3]);
        cache.topo.push_back(sorted_indices[i * 3 + 1]);
        cache.topo.push_back(sorted_indices[i * 3 + 2]);
        cache.topo.push_back((uint32_t)geom_idx);
        const float* attrs =
            &geom.attributes[(size_t)tri_ids[i] * ATTR_STRIDE];
        for (size_t k = 0; k < ATTR_STRIDE; ++k) {
          cache.topo.push_back(f32_to_bits(attrs[k]));
        }
        if (std::fabs(attrs[3] - 3.f) < 1e-6f) {
          cache.emissive.push_back((uint32_t)i);
        }
      }
      cache.valid = true;
    } else if (skin) {
      refit_cached_blas(cache);
    }

    // Splice the cached geometry into the merged buffers, rebasing the
    // topology vertex indices and the leaf triangle ranges (reference
    // rebuilder.rs:121-134). Skip pointers stay geometry-relative per the
    // flat contract (absolutized at upload, render/resources.py).
    uint32_t v_offset = (uint32_t)(buffers_.vertices.size() / 4);
    uint32_t topo_start = (uint32_t)(buffers_.mesh_topology.size() / 20);

    size_t tbase = buffers_.mesh_topology.size();
    buffers_.mesh_topology.insert(buffers_.mesh_topology.end(),
                                  cache.topo.begin(), cache.topo.end());
    for (size_t i = tbase; i < buffers_.mesh_topology.size(); i += 20) {
      buffers_.mesh_topology[i] += v_offset;
      buffers_.mesh_topology[i + 1] += v_offset;
      buffers_.mesh_topology[i + 2] += v_offset;
    }

    size_t nbase = buffers_.blas_nodes.size();
    buffers_.blas_nodes.insert(buffers_.blas_nodes.end(),
                               cache.nodes.begin(), cache.nodes.end());
    for (size_t i = nbase; i < buffers_.blas_nodes.size(); i += 8) {
      uint32_t data_bits = f32_to_bits(buffers_.blas_nodes[i + 7]);
      if (data_bits != 0) {
        uint32_t lf = data_bits >> 3;
        uint32_t cnt = data_bits & 7;
        buffers_.blas_nodes[i + 7] =
            bits_to_f32(((lf + topo_start) << 3) | cnt);
      }
    }

    emissive_lists.emplace_back();
    emissive_lists.back().reserve(cache.emissive.size());
    for (uint32_t e : cache.emissive) {
      emissive_lists.back().push_back(topo_start + e);
    }

    buffers_.vertices.insert(buffers_.vertices.end(), cache.v_vec4.begin(),
                             cache.v_vec4.end());
    buffers_.normals.insert(buffers_.normals.end(), cache.n_vec4.begin(),
                            cache.n_vec4.end());
    buffers_.uvs.insert(buffers_.uvs.end(), cache.uv_vec2.begin(),
                        cache.uv_vec2.end());

    blas_root_offsets_.push_back(current_node_offset);
    uint32_t node_count =
        (uint32_t)(buffers_.blas_nodes.size() / 8) - current_node_offset;
    current_node_offset += node_count;
    uint32_t topo_end = (uint32_t)(buffers_.mesh_topology.size() / 20);
    geom_ranges.emplace_back(topo_start, topo_end - topo_start);
  }
}

void World::update_node_global(size_t node_idx, const Mat4& parent,
                               std::vector<Mat4>& globals) {
  const Node& node = scene_.nodes[node_idx];
  Mat4 local = Mat4::from_scale_rotation_translation(node.scale, node.rotation,
                                                     node.translation);
  Mat4 global = parent * local;
  globals[node_idx] = global;
  for (size_t child : node.children_indices) {
    update_node_global(child, global, globals);
  }
}

void World::apply_animation(size_t anim_idx, float time) {
  // Keyframe search + Linear/Step lerp (slerp for rotations), wrap-around
  // handling for looped clips (reference lib.rs:383-491). CubicSpline
  // keyframes are sampled at their in-tangent-skipped values (stride 3).
  const Animation& anim = scene_.animations[anim_idx];
  for (const AnimationChannel& channel : anim.channels) {
    size_t node_idx = channel.target_node_index;
    if (node_idx >= scene_.nodes.size()) continue;

    float t = anim.duration > 0.f ? std::fmod(time, anim.duration) : time;
    const std::vector<float>& inputs = channel.inputs;
    size_t count = inputs.size();
    if (count == 0) continue;

    size_t next_idx = 0;
    while (next_idx < count && inputs[next_idx] < t) ++next_idx;
    if (next_idx == 0) next_idx = 1;
    if (next_idx >= count) next_idx = 0;
    size_t prev_idx = next_idx == 0 ? count - 1 : next_idx - 1;

    float t0 = inputs[prev_idx];
    float t1 = inputs[next_idx];
    float dt = t1 < t0 ? anim.duration - t0 + t1 : t1 - t0;
    float current = t1 < t0 ? (t >= t0 ? t - t0 : (anim.duration - t0) + t)
                            : t - t0;
    float factor = dt > 1e-4f ? std::min(1.f, std::max(0.f, current / dt)) : 0.f;

    size_t stride = channel.interpolation == Interpolation::CubicSpline ? 3 : 1;
    size_t offset = channel.interpolation == Interpolation::CubicSpline ? 1 : 0;
    size_t idx0 = prev_idx * stride + offset;
    size_t idx1 = next_idx * stride + offset;
    float tf = channel.interpolation == Interpolation::Step ? 0.f : factor;

    Node& node = scene_.nodes[node_idx];
    switch (channel.path) {
      case ChannelPath::Translation:
        if (idx0 < channel.out_vec3.size() && idx1 < channel.out_vec3.size()) {
          Vec3 a = channel.out_vec3[idx0], b = channel.out_vec3[idx1];
          node.translation = a + (b - a) * tf;
        }
        break;
      case ChannelPath::Rotation:
        if (idx0 < channel.out_quat.size() && idx1 < channel.out_quat.size()) {
          node.rotation = channel.out_quat[idx0].normalized().slerp(
              channel.out_quat[idx1].normalized(), tf);
        }
        break;
      case ChannelPath::Scale:
        if (idx0 < channel.out_vec3.size() && idx1 < channel.out_vec3.size()) {
          Vec3 a = channel.out_vec3[idx0], b = channel.out_vec3[idx1];
          node.scale = a + (b - a) * tf;
        }
        break;
    }
  }
}

}  // namespace wrt
