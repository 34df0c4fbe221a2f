// Native binned-SAH BVH builder for rpt_tpu.
//
// Host-side counterpart of the reference's kd-tree *construction*
// (/root/reference/src/kdtree.rs:108-127: sort-based SAH over candidate
// planes). The Python builder in rpt_tpu/ops/bvh.py uses a median split —
// O(T log T) and simple, but median trees visit ~1.5-2x more nodes per ray
// than SAH trees. This builder produces the SAME skip-link preorder contract
// (node_min/max, skip, is_leaf, leaf_start/count, 8-aligned leaf-contiguous
// triangle permutation) with a 16-bin surface-area-heuristic split, so every
// traversal path (XLA while_loop, Pallas packet kernel, TLAS BLAS) consumes
// it unchanged — only the tree shape (and rays/s) differs.
//
// C ABI only (loaded via ctypes): no exceptions across the boundary, caller
// allocates worst-case outputs, actual sizes returned through out-params.
//
// Build: g++ -O3 -shared -fPIC -o _librpt.so bvh_builder.cpp  (see build.py)

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cmath>
#include <vector>

namespace {

constexpr int kBins = 16;
constexpr float kTraverseCost = 1.0f;
constexpr float kIsectCost = 1.5f;

struct Aabb {
  float mn[3], mx[3];
  Aabb() {
    for (int k = 0; k < 3; ++k) {
      mn[k] = 3.0e38f;
      mx[k] = -3.0e38f;
    }
  }
  void grow(const float* lo, const float* hi) {
    for (int k = 0; k < 3; ++k) {
      mn[k] = std::min(mn[k], lo[k]);
      mx[k] = std::max(mx[k], hi[k]);
    }
  }
  void grow(const Aabb& o) { grow(o.mn, o.mx); }
  void grow_point(const float* p) { grow(p, p); }
  float half_area() const {
    float dx = std::max(mx[0] - mn[0], 0.0f);
    float dy = std::max(mx[1] - mn[1], 0.0f);
    float dz = std::max(mx[2] - mn[2], 0.0f);
    return dx * dy + dy * dz + dz * dx;
  }
};

struct Builder {
  const float* tri_min;  // (T,3)
  const float* tri_max;  // (T,3)
  int leaf_size;
  int T;

  std::vector<float> cent;     // (T,3) centroids
  std::vector<int64_t> idx;    // work list, partitioned in place
  // Output (preorder, grown as we go)
  std::vector<float> node_min, node_max;
  std::vector<int32_t> skip, is_leaf, leaf_start, leaf_count;
  std::vector<int64_t> perm;   // 8-aligned padded triangle permutation

  int emit_node(const Aabb& b, bool leaf) {
    int nid = (int)is_leaf.size();
    for (int k = 0; k < 3; ++k) {
      node_min.push_back(b.mn[k]);
      node_max.push_back(b.mx[k]);
    }
    is_leaf.push_back(leaf ? 1 : 0);
    skip.push_back(0);        // patched by caller
    leaf_start.push_back(0);  // patched for leaves
    leaf_count.push_back(0);
    return nid;
  }

  void make_leaf(int nid, int64_t* ids, int n) {
    leaf_start[nid] = (int32_t)perm.size();
    leaf_count[nid] = n;
    for (int i = 0; i < n; ++i) perm.push_back(ids[i]);
    // Pad to the leaf row size by repeating the first triangle (masked out
    // by leaf_count downstream) so one leaf == one aligned dense block.
    for (int i = n; i < leaf_size; ++i) perm.push_back(ids[0]);
  }

  // Build subtree over idx[lo, hi); returns its root node id. Skip links are
  // patched to point one past the subtree on return.
  int build(int lo, int hi) {
    int n = hi - lo;
    Aabb bounds, cbounds;
    for (int i = lo; i < hi; ++i) {
      int64_t t = idx[i];
      bounds.grow(tri_min + 3 * t, tri_max + 3 * t);
      cbounds.grow_point(&cent[3 * t]);
    }

    if (n <= leaf_size) {
      // TPU cost model: a leaf visit is one fixed-cost (leaf_size, 128) DMA +
      // vector test regardless of count, so a partially-full leaf is never
      // worth splitting further (unlike scalar-CPU SAH).
      int nid = emit_node(bounds, true);
      make_leaf(nid, &idx[lo], n);
      skip[nid] = nid + 1;
      return nid;
    }

    // Binned SAH over the centroid extent of each axis.
    float best_cost = 3.0e38f;
    int best_axis = -1, best_bin = -1;
    float area = bounds.half_area();
    for (int axis = 0; axis < 3; ++axis) {
      float lo_c = cbounds.mn[axis], hi_c = cbounds.mx[axis];
      float extent = hi_c - lo_c;
      if (!(extent > 0.0f)) continue;
      float inv = kBins / extent;
      Aabb bin_b[kBins];
      int bin_n[kBins] = {0};
      for (int i = lo; i < hi; ++i) {
        int64_t t = idx[i];
        int b = (int)((cent[3 * t + axis] - lo_c) * inv);
        b = std::min(std::max(b, 0), kBins - 1);
        bin_b[b].grow(tri_min + 3 * t, tri_max + 3 * t);
        bin_n[b] += 1;
      }
      // Sweep: suffix areas right-to-left, prefix left-to-right. The "count"
      // in the SAH term is ceil(n / leaf_size): the number of fixed-cost
      // leaf blocks a subtree of n triangles will need (see TPU cost model
      // note above) — this rewards packing full 8-triangle leaves.
      auto blocks = [&](int c) { return (c + leaf_size - 1) / leaf_size; };
      float r_area[kBins];
      int r_count[kBins];
      Aabb acc;
      int cnt = 0;
      for (int b = kBins - 1; b >= 1; --b) {
        acc.grow(bin_b[b]);
        cnt += bin_n[b];
        r_area[b] = acc.half_area();
        r_count[b] = cnt;
      }
      Aabb lacc;
      int lcnt = 0;
      for (int b = 0; b < kBins - 1; ++b) {
        lacc.grow(bin_b[b]);
        lcnt += bin_n[b];
        if (lcnt == 0 || r_count[b + 1] == 0) continue;
        float cost = kTraverseCost +
                     kIsectCost *
                         (lacc.half_area() * blocks(lcnt) +
                          r_area[b + 1] * blocks(r_count[b + 1])) /
                         area;
        if (cost < best_cost) {
          best_cost = cost;
          best_axis = axis;
          best_bin = b;
        }
      }
    }

    if (best_axis < 0) {
      // Degenerate (all centroids equal) but too many for one leaf: chop
      // into fixed-size runs under a chain of internal nodes.
      int nid = emit_node(bounds, false);
      int mid = lo + n / 2;
      build(lo, mid);
      build(mid, hi);
      skip[nid] = (int32_t)is_leaf.size();
      return nid;
    }

    // Partition idx[lo,hi) by the chosen bin plane (in place).
    float lo_c = cbounds.mn[best_axis];
    float inv = kBins / (cbounds.mx[best_axis] - lo_c);
    auto side = [&](int64_t t) {
      int b = (int)((cent[3 * t + best_axis] - lo_c) * inv);
      return std::min(std::max(b, 0), kBins - 1) <= best_bin;
    };
    int mid = (int)(std::stable_partition(idx.begin() + lo, idx.begin() + hi, side) -
                    idx.begin());
    if (mid == lo || mid == hi) mid = lo + n / 2;  // numeric safety net

    int nid = emit_node(bounds, false);
    build(lo, mid);
    build(mid, hi);
    skip[nid] = (int32_t)is_leaf.size();
    return nid;
  }
};

}  // namespace

extern "C" {

// Returns 0 on success. Outputs are caller-allocated worst-case buffers:
//   nodes: cap_nodes >= 2*ceil(T/1)+1 entries; perm: cap_perm >= 8*T.
// Actual counts come back in *out_nodes / *out_perm.
int rpt_build_bvh_sah(const float* tri_min, const float* tri_max, int64_t n_tris,
                      int leaf_size, float* node_min, float* node_max,
                      int32_t* is_leaf, int32_t* skip, int32_t* leaf_start,
                      int32_t* leaf_count, int64_t* perm, int64_t cap_nodes,
                      int64_t cap_perm, int64_t* out_nodes, int64_t* out_perm) {
  if (n_tris <= 0 || leaf_size <= 0) return 1;
  Builder b;
  b.tri_min = tri_min;
  b.tri_max = tri_max;
  b.leaf_size = leaf_size;
  b.T = (int)n_tris;
  b.cent.resize(3 * n_tris);
  for (int64_t t = 0; t < n_tris; ++t)
    for (int k = 0; k < 3; ++k)
      b.cent[3 * t + k] = 0.5f * (tri_min[3 * t + k] + tri_max[3 * t + k]);
  b.idx.resize(n_tris);
  for (int64_t t = 0; t < n_tris; ++t) b.idx[t] = t;
  size_t reserve_nodes = (size_t)std::min<int64_t>(cap_nodes, 2 * n_tris + 1);
  b.node_min.reserve(3 * reserve_nodes);
  b.is_leaf.reserve(reserve_nodes);
  b.perm.reserve((size_t)std::min<int64_t>(cap_perm, 2 * n_tris + leaf_size));

  b.build(0, (int)n_tris);

  int64_t M = (int64_t)b.is_leaf.size();
  int64_t P = (int64_t)b.perm.size();
  if (M > cap_nodes || P > cap_perm) return 2;
  std::memcpy(node_min, b.node_min.data(), sizeof(float) * 3 * M);
  std::memcpy(node_max, b.node_max.data(), sizeof(float) * 3 * M);
  std::memcpy(is_leaf, b.is_leaf.data(), sizeof(int32_t) * M);
  std::memcpy(skip, b.skip.data(), sizeof(int32_t) * M);
  std::memcpy(leaf_start, b.leaf_start.data(), sizeof(int32_t) * M);
  std::memcpy(leaf_count, b.leaf_count.data(), sizeof(int32_t) * M);
  std::memcpy(perm, b.perm.data(), sizeof(int64_t) * P);
  *out_nodes = M;
  *out_perm = P;
  return 0;
}

}  // extern "C"
