// Core scene-graph / material / animation types for the scene compiler.
// Capability parity with reference rust-shader-tools/src/scene/ (SceneData,
// CameraConfig, Node, Skin, Animation) and bvh/mod.rs (Instance).
#pragma once
#include <cstdint>
#include <memory>
#include <optional>
#include <string>
#include <vector>

#include "aabb.h"
#include "vecmath.h"

namespace wrt {

// Material type ids — the f32-encoded contract in topology data0.w
// (reference scene/material.rs:3-6).
namespace mat_type {
constexpr uint32_t LAMBERTIAN = 0;
constexpr uint32_t METAL = 1;
constexpr uint32_t DIELECTRIC = 2;
constexpr uint32_t LIGHT = 3;
}  // namespace mat_type

// Camera configuration; create_buffer emits the 24-float camera block
// (reference scene/camera.rs:14-56; consumed by Raytracer.wgsl:16-23).
struct CameraConfig {
  Vec3 lookfrom{0, 0, -1};
  Vec3 lookat{0, 0, 0};
  Vec3 vup{0, 1, 0};
  float vfov = 60.f;
  float defocus_angle = 0.f;
  float focus_dist = 1.f;

  void create_buffer(float aspect_ratio, float out[24]) const {
    float theta = radians(vfov);
    float h = std::tan(theta / 2.f);
    float viewport_height = 2.f * h * focus_dist;
    float viewport_width = viewport_height * aspect_ratio;

    Vec3 w = (lookfrom - lookat).normalized();
    Vec3 u = vup.cross(w).normalized();
    Vec3 v = w.cross(u);

    Vec3 horizontal = u * viewport_width;
    Vec3 vertical = v * viewport_height;
    Vec3 lower_left = lookfrom - horizontal * 0.5f - vertical * 0.5f - w * focus_dist;
    float lens_radius = focus_dist * std::tan(radians(defocus_angle) / 2.f);

    float buf[24] = {
        lookfrom.x, lookfrom.y, lookfrom.z, lens_radius,
        lower_left.x, lower_left.y, lower_left.z, 0.f,
        horizontal.x, horizontal.y, horizontal.z, 0.f,
        vertical.x, vertical.y, vertical.z, 0.f,
        u.x, u.y, u.z, 0.f,
        v.x, v.y, v.z, 0.f,
    };
    std::copy(buf, buf + 24, out);
  }
};

// Scene-graph node with TRS locals and a cached global transform
// (reference scene/node.rs:6-33).
struct Node {
  std::string name;
  Vec3 translation{0, 0, 0};
  Quat rotation;
  Vec3 scale{1, 1, 1};
  std::optional<size_t> parent_index;
  std::vector<size_t> children_indices;
  Mat4 global_transform;
};

// Skin: joint node indices + inverse bind matrices (reference scene/skin).
struct Skin {
  std::vector<size_t> joints;
  std::vector<Mat4> inverse_bind_matrices;
};

// Animation channel targeting one node property
// (reference scene/animation.rs:1-32).
enum class Interpolation { Linear, Step, CubicSpline };
enum class ChannelPath { Translation, Rotation, Scale };

struct AnimationChannel {
  size_t target_node_index = 0;
  Interpolation interpolation = Interpolation::Linear;
  ChannelPath path = ChannelPath::Translation;
  std::vector<float> inputs;           // keyframe times
  std::vector<Vec3> out_vec3;          // translations or scales
  std::vector<Quat> out_quat;          // rotations
};

struct Animation {
  std::string name;
  float duration = 0.f;
  std::vector<AnimationChannel> channels;
};

// One instance as authored in a scene preset / loader.
struct SceneInstance {
  Mat4 transform;
  size_t geometry_index = 0;
};

// Runtime instance record; packed to the 36-f32 flat layout
// (reference bvh/mod.rs:18-27 / Raytracer.wgsl:61-74).
struct Instance {
  Mat4 transform;
  Mat4 inverse_transform;
  uint32_t blas_node_offset = 0;
  uint32_t attr_offset = 0;
  uint32_t instance_id = 0;  // geometry index
  uint32_t pad = 0;
};

class Geometry;  // geometry.h

// The full authored scene (reference scene/mod.rs SceneData).
struct SceneData {
  CameraConfig camera;
  std::vector<Geometry> geometries;
  std::vector<SceneInstance> instances;
  std::vector<Node> nodes;
  std::vector<Skin> skins;
  std::vector<Animation> animations;
  std::vector<std::vector<uint8_t>> textures;  // raw encoded image bytes
};

}  // namespace wrt
