// Stackless skip-pointer BVH builders.
//
// Node format is the 8-f32 flat contract shared by TLAS and BLAS
// (reference bvh/mod.rs:9-16, blas.rs:220-234, tlas.rs:113-127):
//   [min.x, min.y, min.z, bitcast(skip_pointer), max.x, max.y, max.z, bitcast(data)]
// data == 0 -> internal node; else leaf with first = data >> 3, count = data & 7.
// Traversal: hit-internal -> curr+1 (depth first); miss or leaf-done -> skip.
// Root skip_pointer == node count (end sentinel). Children are ordered so the
// cheaper (surface-area x count) subtree is visited first.
#pragma once
#include <cstdint>
#include <vector>

#include "aabb.h"
#include "scene_types.h"

namespace wrt {

struct BVHNode {
  Vec3 min_b;
  Vec3 max_b;
  uint32_t skip_pointer = 0;
  uint32_t data = 0;
};

// Append the packed 8-f32 records for `nodes` to `out`.
void pack_nodes(const std::vector<BVHNode>& nodes, std::vector<float>& out);

// Binned-SAH BLAS over one geometry's triangles (16 bins, <=4 tris/leaf).
// Behavior parity: reference bvh/blas.rs.
class BlasBuilder {
 public:
  // vertices: xyzw strided positions; indices: 3 per triangle.
  BlasBuilder(const std::vector<float>& vertices,
              const std::vector<uint32_t>& indices);

  // Returns (packed nodes appended to out_nodes, triangle-sorted flat indices,
  // and the leaf-ordered original triangle ids used to reorder attributes).
  void build(std::vector<float>& out_nodes, std::vector<uint32_t>& sorted_indices,
             std::vector<uint32_t>& tri_ids);

 private:
  void subdivide(size_t first, size_t count);

  const std::vector<uint32_t>& indices_;
  std::vector<BVHNode> nodes_;
  std::vector<uint32_t> tri_order_;
  std::vector<AABB> tri_aabbs_;
  std::vector<Vec3> tri_centers_;
};

// TLAS over instances: median split on the largest axis, 1 instance/leaf.
// Behavior parity: reference bvh/tlas.rs.
class TlasBuilder {
 public:
  TlasBuilder(const std::vector<Instance>& instances,
              const std::vector<AABB>& blas_aabbs);

  // Returns packed nodes and the TLAS-sorted instance order.
  void build(std::vector<float>& out_nodes, std::vector<Instance>& sorted);

 private:
  void subdivide(size_t first, size_t count);

  const std::vector<Instance>& instances_;
  std::vector<BVHNode> nodes_;
  std::vector<size_t> order_;
  std::vector<AABB> aabbs_;
  std::vector<Vec3> centers_;
};

}  // namespace wrt
