// Native SAH BVH builder.
//
// C++ twin of accel/build.py's NumPy builder, for production-size scenes
// (San Miguel ~10M tris): the reference builds its BVH in threaded C++
// (BVH.hpp:290-390, 2 jthreads per split above 256K prims) and so do we.
// Same algorithm and output layout as the Python builder so the two are
// interchangeable (tested equal in tests/test_bvh.py):
//   * binned SAH, 32/16/8 bins by span (BVH.hpp:312-313)
//   * leaf when SAH says so and count < LEAF_SHIFT, or span <= leaf_max
//   * binary tree collapsed to 8-wide nodes by greedy largest-area
//     expansion (BVH.hpp:1320-1338), BFS-flattened
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -march=native -std=c++20 -shared -fPIC -pthread

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <thread>
#include <vector>

namespace {

constexpr int W = 8;
constexpr int LEAF_SHIFT = 8;
constexpr float INF = std::numeric_limits<float>::infinity();

struct Vec3 {
  float x, y, z;
  Vec3 min(const Vec3& o) const {
    return {std::min(x, o.x), std::min(y, o.y), std::min(z, o.z)};
  }
  Vec3 max(const Vec3& o) const {
    return {std::max(x, o.x), std::max(y, o.y), std::max(z, o.z)};
  }
  float operator[](int i) const { return i == 0 ? x : (i == 1 ? y : z); }
};

struct Box {
  Vec3 lo{INF, INF, INF}, hi{-INF, -INF, -INF};
  void expand(const Box& b) { lo = lo.min(b.lo); hi = hi.max(b.hi); }
  void expand(const Vec3& p) { lo = lo.min(p); hi = hi.max(p); }
  float area() const {
    float dx = std::max(hi.x - lo.x, 0.f);
    float dy = std::max(hi.y - lo.y, 0.f);
    float dz = std::max(hi.z - lo.z, 0.f);
    return dx * dy + dy * dz + dz * dx;
  }
};

struct BNode {
  Box box;
  int32_t left = -1, right = -1;
  int64_t start = 0, count = 0;
};

struct Builder {
  const float* lo;
  const float* hi;
  std::vector<Vec3> centroid;
  std::vector<int64_t> order;
  std::vector<BNode> nodes;
  std::atomic<int64_t> node_count{0};
  int leaf_max;

  Box prim_box(int64_t p) const {
    return {{lo[3 * p], lo[3 * p + 1], lo[3 * p + 2]},
            {hi[3 * p], hi[3 * p + 1], hi[3 * p + 2]}};
  }

  int32_t alloc() { return (int32_t)node_count.fetch_add(1); }

  void build_range(int32_t ni, int64_t s, int64_t e, int depth) {
    int64_t span = e - s;
    BNode& node = nodes[ni];
    Box bb, cb;
    for (int64_t i = s; i < e; ++i) {
      bb.expand(prim_box(order[i]));
      cb.expand(centroid[order[i]]);
    }
    node.box = bb;
    if (span <= leaf_max) {
      node.start = s; node.count = span;
      return;
    }

    int n_bins = span >= 1024 ? 32 : (span >= 64 ? 16 : 8);
    float best_cost = INF;
    int best_axis = -1, best_bin = -1;
    Vec3 cext{cb.hi.x - cb.lo.x, cb.hi.y - cb.lo.y, cb.hi.z - cb.lo.z};
    for (int axis = 0; axis < 3; ++axis) {
      float ext = cext[axis];
      if (ext <= 1e-12f) continue;
      float scale = n_bins / ext;
      float base = cb.lo[axis];
      std::vector<Box> bbox(n_bins);
      std::vector<int64_t> cnt(n_bins, 0);
      for (int64_t i = s; i < e; ++i) {
        int b = std::min((int)((centroid[order[i]][axis] - base) * scale),
                         n_bins - 1);
        bbox[b].expand(prim_box(order[i]));
        cnt[b]++;
      }
      // suffix sweep
      std::vector<float> rarea(n_bins);
      std::vector<int64_t> rcnt(n_bins);
      Box acc; int64_t c = 0;
      for (int b = n_bins - 1; b >= 1; --b) {
        acc.expand(bbox[b]); c += cnt[b];
        rarea[b] = acc.area(); rcnt[b] = c;
      }
      // prefix sweep
      acc = Box(); c = 0;
      for (int b = 0; b < n_bins - 1; ++b) {
        acc.expand(bbox[b]); c += cnt[b];
        if (c == 0 || rcnt[b + 1] == 0) continue;
        float cost = acc.area() * c + rarea[b + 1] * rcnt[b + 1];
        if (cost < best_cost) {
          best_cost = cost; best_axis = axis; best_bin = b;
        }
      }
    }

    float leaf_cost = (float)span * bb.area();
    if (best_axis >= 0 && best_cost >= leaf_cost && span < LEAF_SHIFT) {
      node.start = s; node.count = span;
      return;
    }

    int64_t mid;
    if (best_axis < 0) {
      mid = s + span / 2;  // degenerate centroids: median split
    } else {
      float ext = cext[best_axis];
      float scale = n_bins / ext;
      float base = cb.lo[best_axis];
      auto it = std::partition(
          order.begin() + s, order.begin() + e, [&](int64_t p) {
            int b = std::min((int)((centroid[p][best_axis] - base) * scale),
                             n_bins - 1);
            return b <= best_bin;
          });
      mid = it - order.begin();
      if (mid == s || mid == e) mid = s + span / 2;
    }

    int32_t li = alloc(), ri = alloc();
    node.left = li; node.right = ri;
    if (span > 262144) {  // parallel split threshold (BVH.hpp:374-380)
      std::thread t([this, li, s, mid, depth] {
        build_range(li, s, mid, depth + 1);
      });
      build_range(ri, mid, e, depth + 1);
      t.join();
    } else {
      build_range(li, s, mid, depth + 1);
      build_range(ri, mid, e, depth + 1);
    }
  }
};

inline int64_t leaf_code(int64_t base, int64_t count) {
  return -(base * LEAF_SHIFT + count) - 1;
}

}  // namespace

extern "C" {

// Returns 0 on success.  Caller allocates:
//   order      [n_prims]  int64
//   wide_lo/hi [max_nodes * W * 3] float   (max_nodes = n_prims + 1)
//   wide_child [max_nodes * W]     int32
//   out_counts [2] int64: {n_wide_nodes, max_depth}
int build_bvh_native(const float* lo, const float* hi, int64_t n_prims,
                     int32_t leaf_max, int64_t max_nodes, int64_t* order,
                     float* wide_lo, float* wide_hi, int32_t* wide_child,
                     int64_t* out_counts) {
  if (n_prims <= 0) return 1;
  Builder b;
  b.lo = lo; b.hi = hi; b.leaf_max = leaf_max;
  b.centroid.resize(n_prims);
  for (int64_t i = 0; i < n_prims; ++i) {
    b.centroid[i] = {0.5f * (lo[3 * i] + hi[3 * i]),
                     0.5f * (lo[3 * i + 1] + hi[3 * i + 1]),
                     0.5f * (lo[3 * i + 2] + hi[3 * i + 2])};
  }
  b.order.resize(n_prims);
  for (int64_t i = 0; i < n_prims; ++i) b.order[i] = i;
  // binary nodes bound: 2n-1
  b.nodes.resize(2 * n_prims + 1);
  int32_t root = b.alloc();
  b.build_range(root, 0, n_prims, 0);

  // ---- collapse to wide nodes, BFS (mirrors accel/build.py)
  auto area = [&](int32_t i) { return b.nodes[i].box.area(); };
  std::vector<int32_t> queue;          // binary indices whose wide node exists
  std::vector<int64_t> wide_of(b.node_count.load(), -1);
  std::vector<int32_t> depth_of;
  int64_t n_wide = 0;
  auto new_wide = [&]() -> int64_t {
    int64_t w = n_wide++;
    if (w >= max_nodes) return -1;
    for (int j = 0; j < W; ++j) {
      for (int k = 0; k < 3; ++k) {
        wide_lo[(w * W + j) * 3 + k] = INF;
        wide_hi[(w * W + j) * 3 + k] = -INF;
      }
      wide_child[w * W + j] = 0;
    }
    return w;
  };
  if (new_wide() < 0) return 2;
  queue.push_back(root);
  wide_of[root] = 0;
  depth_of.push_back(1);
  int64_t max_depth = 1;

  for (size_t qi = 0; qi < queue.size(); ++qi) {
    int32_t bi = queue[qi];
    int64_t wi = wide_of[bi];
    int32_t my_depth = depth_of[qi];

    int32_t children[W];
    int n_children = 0;
    if (b.nodes[bi].left < 0) {
      children[n_children++] = bi;
    } else {
      children[n_children++] = b.nodes[bi].left;
      children[n_children++] = b.nodes[bi].right;
    }
    while (n_children < W) {
      int pick = -1; float best_a = -1.f;
      for (int j = 0; j < n_children; ++j) {
        if (b.nodes[children[j]].left >= 0 && area(children[j]) > best_a) {
          best_a = area(children[j]); pick = j;
        }
      }
      if (pick < 0) break;
      int32_t c = children[pick];
      children[pick] = b.nodes[c].left;
      children[n_children++] = b.nodes[c].right;
    }

    for (int j = 0; j < n_children; ++j) {
      int32_t c = children[j];
      const Box& box = b.nodes[c].box;
      wide_lo[(wi * W + j) * 3 + 0] = box.lo.x;
      wide_lo[(wi * W + j) * 3 + 1] = box.lo.y;
      wide_lo[(wi * W + j) * 3 + 2] = box.lo.z;
      wide_hi[(wi * W + j) * 3 + 0] = box.hi.x;
      wide_hi[(wi * W + j) * 3 + 1] = box.hi.y;
      wide_hi[(wi * W + j) * 3 + 2] = box.hi.z;
      if (b.nodes[c].left < 0) {
        wide_child[wi * W + j] =
            (int32_t)leaf_code(b.nodes[c].start, b.nodes[c].count);
      } else {
        int64_t cw = new_wide();
        if (cw < 0) return 2;
        wide_of[c] = cw;
        wide_child[wi * W + j] = (int32_t)cw;
        queue.push_back(c);
        depth_of.push_back(my_depth + 1);
        max_depth = std::max(max_depth, (int64_t)my_depth + 1);
      }
    }
  }

  std::memcpy(order, b.order.data(), n_prims * sizeof(int64_t));
  out_counts[0] = n_wide;
  out_counts[1] = max_depth;
  return 0;
}

}  // extern "C"
