#include "bvh.h"

#include <algorithm>
#include <cstring>
#include <limits>

namespace wrt {

namespace {
inline float bits_to_f32(uint32_t u) {
  float f;
  std::memcpy(&f, &u, 4);
  return f;
}

// Split-axis pick, same tie-break chain as the reference (blas.rs:106):
// y if y > x, else z if z beats both, else x.
inline int split_axis(const Vec3& extent) {
  if (extent.y > extent.x) return 1;
  if (extent.z > extent.x && extent.z > extent.y) return 2;
  return 0;
}
}  // namespace

void pack_nodes(const std::vector<BVHNode>& nodes, std::vector<float>& out) {
  out.reserve(out.size() + nodes.size() * 8);
  for (const BVHNode& n : nodes) {
    out.push_back(n.min_b.x);
    out.push_back(n.min_b.y);
    out.push_back(n.min_b.z);
    out.push_back(bits_to_f32(n.skip_pointer));
    out.push_back(n.max_b.x);
    out.push_back(n.max_b.y);
    out.push_back(n.max_b.z);
    out.push_back(bits_to_f32(n.data));
  }
}

// ---------------------------------------------------------------------------
// BLAS
// ---------------------------------------------------------------------------

BlasBuilder::BlasBuilder(const std::vector<float>& vertices,
                         const std::vector<uint32_t>& indices)
    : indices_(indices) {
  size_t tri_count = indices.size() / 3;
  tri_aabbs_.reserve(tri_count);
  tri_centers_.reserve(tri_count);
  for (size_t i = 0; i < tri_count; ++i) {
    auto v = [&](size_t k) {
      size_t b = (size_t)indices[i * 3 + k] * 4;
      return Vec3{vertices[b], vertices[b + 1], vertices[b + 2]};
    };
    Vec3 v0 = v(0), v1 = v(1), v2 = v(2);
    Vec3 mn = v0.min(v1).min(v2);
    Vec3 mx = v0.max(v1).max(v2);
    // Pad degenerate axes so flat triangles still have usable AABBs
    // (reference blas.rs:42-54).
    Vec3 size = mx - mn;
    constexpr float eps = 1e-5f;
    Vec3 pad{size.x < eps ? eps : 0.f, size.y < eps ? eps : 0.f,
             size.z < eps ? eps : 0.f};
    AABB box;
    box.min = mn - pad * 0.5f;
    box.max = mx + pad * 0.5f;
    tri_aabbs_.push_back(box);
    tri_centers_.push_back(box.center());
  }
}

void BlasBuilder::build(std::vector<float>& out_nodes,
                        std::vector<uint32_t>& sorted_indices,
                        std::vector<uint32_t>& tri_ids) {
  nodes_.clear();
  size_t tri_count = indices_.size() / 3;
  tri_order_.resize(tri_count);
  for (size_t i = 0; i < tri_count; ++i) tri_order_[i] = (uint32_t)i;

  if (tri_count > 0) subdivide(0, tri_count);

  pack_nodes(nodes_, out_nodes);
  sorted_indices.clear();
  sorted_indices.reserve(indices_.size());
  for (uint32_t tri : tri_order_) {
    sorted_indices.push_back(indices_[(size_t)tri * 3]);
    sorted_indices.push_back(indices_[(size_t)tri * 3 + 1]);
    sorted_indices.push_back(indices_[(size_t)tri * 3 + 2]);
  }
  tri_ids = tri_order_;
}

void BlasBuilder::subdivide(size_t first, size_t count) {
  size_t node_idx = nodes_.size();
  nodes_.emplace_back();

  AABB bounds;
  for (size_t i = 0; i < count; ++i)
    bounds = bounds.unite(tri_aabbs_[tri_order_[first + i]]);
  nodes_[node_idx].min_b = bounds.min;
  nodes_[node_idx].max_b = bounds.max;

  auto make_leaf = [&]() {
    nodes_[node_idx].data = ((uint32_t)first << 3) | (uint32_t)count;
    nodes_[node_idx].skip_pointer = (uint32_t)nodes_.size();
  };
  // Degenerate-split fallback: the leaf count field is 3 bits, so oversized
  // clusters (e.g. hundreds of coincident-center triangles) must be forced
  // apart by an object-median split instead of emitted as a corrupt leaf.
  // (The reference's fallback paths, blas.rs:111-115/167-171/196-200, can
  // overflow the 3-bit count; this is the fixed equivalent.)
  auto forced_split = [&](int axis) {
    std::nth_element(
        tri_order_.begin() + first, tri_order_.begin() + first + count / 2,
        tri_order_.begin() + first + count,
        [&](uint32_t a, uint32_t b) {
          return tri_centers_[a][axis] < tri_centers_[b][axis];
        });
    nodes_[node_idx].data = 0;
    size_t half = count / 2;
    subdivide(first, half);
    subdivide(first + half, count - half);
    nodes_[node_idx].skip_pointer = (uint32_t)nodes_.size();
  };

  if (count <= 4) {
    make_leaf();
    return;
  }

  Vec3 extent = bounds.max - bounds.min;
  int axis = split_axis(extent);
  float split_len = extent[axis];
  float split_min = bounds.min[axis];
  if (split_len < 1e-6f) {
    forced_split(axis);
    return;
  }

  // 16-bin SAH with prefix/suffix area scans (reference blas.rs:117-165).
  constexpr size_t BINS = 16;
  struct Bin {
    AABB bounds;
    uint32_t count = 0;
  };
  Bin bins[BINS];
  float scale = (float)BINS / split_len;
  auto bin_of = [&](float v) {
    size_t idx = (size_t)((v - split_min) * scale);
    return std::min(idx, BINS - 1);
  };

  for (size_t i = 0; i < count; ++i) {
    uint32_t tri = tri_order_[first + i];
    Bin& b = bins[bin_of(tri_centers_[tri][axis])];
    b.count += 1;
    b.bounds = b.bounds.unite(tri_aabbs_[tri]);
  }

  float left_area[BINS], right_area[BINS];
  uint32_t left_count[BINS], right_count[BINS];
  {
    AABB box;
    uint32_t sum = 0;
    for (size_t i = 0; i < BINS; ++i) {
      sum += bins[i].count;
      box = box.unite(bins[i].bounds);
      left_area[i] = box.area();
      left_count[i] = sum;
    }
    box = AABB();
    sum = 0;
    for (size_t i = BINS; i-- > 0;) {
      sum += bins[i].count;
      box = box.unite(bins[i].bounds);
      right_area[i] = box.area();
      right_count[i] = sum;
    }
  }

  float best_cost = std::numeric_limits<float>::infinity();
  size_t best_split = SIZE_MAX;
  for (size_t i = 0; i + 1 < BINS; ++i) {
    if (left_count[i] == 0 || right_count[i + 1] == 0) continue;
    float cost = left_area[i] * left_count[i] + right_area[i + 1] * right_count[i + 1];
    if (cost < best_cost) {
      best_cost = cost;
      best_split = i;
    }
  }
  if (best_split == SIZE_MAX) {
    forced_split(axis);
    return;
  }

  // In-place partition around the chosen bin boundary.
  size_t i = first;
  size_t j = first + count;  // exclusive
  while (i < j) {
    if (bin_of(tri_centers_[tri_order_[i]][axis]) <= best_split) {
      ++i;
    } else {
      std::swap(tri_order_[i], tri_order_[j - 1]);
      --j;
    }
  }

  size_t l_count = i - first;
  size_t r_count = count - l_count;
  if (l_count == 0 || l_count == count) {
    forced_split(axis);
    return;
  }

  // Stackless front-to-back heuristic: put the cheaper (area x count) child
  // first in memory so it is traversed first (reference blas.rs:202-210).
  float l_cost = left_area[best_split] * (float)l_count;
  float r_cost = right_area[best_split + 1] * (float)r_count;
  if (r_cost > l_cost) {
    std::rotate(tri_order_.begin() + first, tri_order_.begin() + first + l_count,
                tri_order_.begin() + first + count);
    std::swap(l_count, r_count);
  }

  nodes_[node_idx].data = 0;  // internal
  subdivide(first, l_count);
  subdivide(first + l_count, r_count);
  nodes_[node_idx].skip_pointer = (uint32_t)nodes_.size();
}

// ---------------------------------------------------------------------------
// TLAS
// ---------------------------------------------------------------------------

TlasBuilder::TlasBuilder(const std::vector<Instance>& instances,
                         const std::vector<AABB>& blas_aabbs)
    : instances_(instances) {
  size_t count = instances.size();
  aabbs_.reserve(count);
  centers_.reserve(count);
  order_.resize(count);
  for (size_t i = 0; i < count; ++i) {
    order_[i] = i;
    AABB world = blas_aabbs[i].transform(instances[i].transform);
    aabbs_.push_back(world);
    centers_.push_back(world.center());
  }
}

void TlasBuilder::build(std::vector<float>& out_nodes,
                        std::vector<Instance>& sorted) {
  nodes_.clear();
  sorted.clear();
  if (instances_.empty()) return;

  subdivide(0, instances_.size());
  pack_nodes(nodes_, out_nodes);

  sorted.reserve(instances_.size());
  for (size_t idx : order_) sorted.push_back(instances_[idx]);
}

void TlasBuilder::subdivide(size_t first, size_t count) {
  size_t node_idx = nodes_.size();
  nodes_.emplace_back();

  AABB bounds;
  for (size_t i = 0; i < count; ++i)
    bounds = bounds.unite(aabbs_[order_[first + i]]);
  nodes_[node_idx].min_b = bounds.min;
  nodes_[node_idx].max_b = bounds.max;

  if (count == 1) {
    nodes_[node_idx].data = ((uint32_t)first << 3) | 1u;
    nodes_[node_idx].skip_pointer = (uint32_t)nodes_.size();
    return;
  }

  Vec3 extent = bounds.max - bounds.min;
  int axis = split_axis(extent);

  std::sort(order_.begin() + first, order_.begin() + first + count,
            [&](size_t a, size_t b) { return centers_[a][axis] < centers_[b][axis]; });

  size_t mid = count / 2;
  size_t l_count = mid;
  size_t r_count = count - mid;

  AABB l_box, r_box;
  for (size_t i = 0; i < l_count; ++i) l_box = l_box.unite(aabbs_[order_[first + i]]);
  for (size_t i = 0; i < r_count; ++i)
    r_box = r_box.unite(aabbs_[order_[first + mid + i]]);

  // Cheaper-child-first rotation, same heuristic as the BLAS.
  if (r_box.area() * (float)r_count > l_box.area() * (float)l_count) {
    std::rotate(order_.begin() + first, order_.begin() + first + l_count,
                order_.begin() + first + count);
    std::swap(l_count, r_count);
  }

  nodes_[node_idx].data = 0;
  subdivide(first, l_count);
  subdivide(first + l_count, r_count);
  nodes_[node_idx].skip_pointer = (uint32_t)nodes_.size();
}

}  // namespace wrt
