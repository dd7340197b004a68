// Axis-aligned bounding box used by the BLAS/TLAS builders.
// Behavior parity: reference rust-shader-tools/src/primitives.rs:7-76.
#pragma once
#include <limits>
#include "vecmath.h"

namespace wrt {

struct AABB {
  Vec3 min = Vec3::splat(std::numeric_limits<float>::infinity());
  Vec3 max = Vec3::splat(-std::numeric_limits<float>::infinity());

  static AABB empty() { return AABB(); }

  void grow(const Vec3& p) {
    min = min.min(p);
    max = max.max(p);
  }

  AABB unite(const AABB& o) const {
    AABB r;
    r.min = min.min(o.min);
    r.max = max.max(o.max);
    return r;
  }

  float area() const {
    Vec3 d = max - min;
    if (d.x < 0.f || d.y < 0.f || d.z < 0.f) return 0.f;
    return 2.f * (d.x * d.y + d.y * d.z + d.z * d.x);
  }

  Vec3 center() const { return (min + max) * 0.5f; }

  // Transform all 8 corners and take the bound (reference primitives.rs:56-75).
  AABB transform(const Mat4& mat) const {
    Vec3 corners[8] = {
        {min.x, min.y, min.z}, {max.x, min.y, min.z},
        {min.x, max.y, min.z}, {max.x, max.y, min.z},
        {min.x, min.y, max.z}, {max.x, min.y, max.z},
        {min.x, max.y, max.z}, {max.x, max.y, max.z},
    };
    AABB r;
    for (const Vec3& c : corners) r.grow(mat.transform_point(c));
    return r;
  }
};

}  // namespace wrt
