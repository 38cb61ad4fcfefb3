// Native binned-SAH 8-wide BVH builder.
//
// Production-scale counterpart of the Python builder in
// phosphorus_mk2_tpu/accel/bvh_builder.py (same output contract; the
// Python builder remains the correctness oracle). Same role as the
// reference's C++ builder (reference src/accel/bvh/binned_sah_builder.hpp):
// 12 SAH bins over 3 axes, 8-wide nodes grown by repeatedly splitting the
// largest child, leaves of <= 8 triangles padded to group alignment.
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment):
//   bvh_build(vertices, n_verts, faces, n_faces) -> handle
//   bvh_counts(handle, &n_nodes, &n_leaf)
//   bvh_export(handle, bmin, bmax, child, count, leaf)
//   bvh_free(handle)
//
// Build: g++ -O3 -march=native -shared -fPIC -o libphbvh.so bvh_builder.cpp

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int NUM_BINS = 12;
constexpr int MAX_LEAF = 8;
constexpr int WIDTH = 8;

struct Vec3 {
  float x, y, z;
  Vec3() : x(0), y(0), z(0) {}
  Vec3(float a, float b, float c) : x(a), y(b), z(c) {}
};

static inline Vec3 vmin(const Vec3& a, const Vec3& b) {
  return Vec3(std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z));
}
static inline Vec3 vmax(const Vec3& a, const Vec3& b) {
  return Vec3(std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z));
}

struct Bounds {
  Vec3 lo, hi;
  Bounds()
      : lo(FLT_MAX, FLT_MAX, FLT_MAX), hi(-FLT_MAX, -FLT_MAX, -FLT_MAX) {}
  void extend(const Bounds& b) {
    lo = vmin(lo, b.lo);
    hi = vmax(hi, b.hi);
  }
  void extend(const Vec3& p) {
    lo = vmin(lo, p);
    hi = vmax(hi, p);
  }
  float area() const {
    float dx = std::max(hi.x - lo.x, 0.f);
    float dy = std::max(hi.y - lo.y, 0.f);
    float dz = std::max(hi.z - lo.z, 0.f);
    return 2.f * (dx * dy + dy * dz + dz * dx);
  }
};

struct Builder {
  // per-primitive data
  std::vector<Bounds> prim_bounds;
  std::vector<Vec3> centroid;
  // output
  std::vector<float> node_bmin;   // n_nodes * 8 * 3
  std::vector<float> node_bmax;
  std::vector<int32_t> node_child;  // n_nodes * 8
  std::vector<int32_t> node_count;
  std::vector<int32_t> leaf_tris;

  Bounds bounds_of(const int32_t* idx, int n) const {
    Bounds b;
    for (int i = 0; i < n; ++i) b.extend(prim_bounds[idx[i]]);
    return b;
  }

  // Binned SAH binary split; returns split point in [1, n-1] after
  // partitioning idx in place, or 0 when degenerate (caller median-splits).
  int sah_split(int32_t* idx, int n) {
    Bounds cb;
    for (int i = 0; i < n; ++i) cb.extend(centroid[idx[i]]);

    float best_cost = FLT_MAX;
    int best_axis = -1, best_bin = -1;

    for (int axis = 0; axis < 3; ++axis) {
      float lo = axis == 0 ? cb.lo.x : axis == 1 ? cb.lo.y : cb.lo.z;
      float hi = axis == 0 ? cb.hi.x : axis == 1 ? cb.hi.y : cb.hi.z;
      float ext = hi - lo;
      if (ext <= 0.f) continue;
      float scale = NUM_BINS * (1.0f - 1e-6f) / ext;

      int counts[NUM_BINS] = {0};
      Bounds bins[NUM_BINS];
      for (int i = 0; i < n; ++i) {
        const Vec3& c = centroid[idx[i]];
        float v = axis == 0 ? c.x : axis == 1 ? c.y : c.z;
        int b = std::min(int((v - lo) * scale), NUM_BINS - 1);
        counts[b]++;
        bins[b].extend(prim_bounds[idx[i]]);
      }

      Bounds right[NUM_BINS];
      Bounds acc;
      for (int b = NUM_BINS - 1; b >= 0; --b) {
        acc.extend(bins[b]);
        right[b] = acc;
      }
      Bounds left;
      int lcnt = 0;
      for (int b = 0; b < NUM_BINS - 1; ++b) {
        left.extend(bins[b]);
        lcnt += counts[b];
        int rcnt = n - lcnt;
        if (lcnt == 0 || rcnt == 0) continue;
        float cost = left.area() * lcnt + right[b + 1].area() * rcnt;
        if (cost < best_cost) {
          best_cost = cost;
          best_axis = axis;
          best_bin = b;
        }
      }
    }

    if (best_axis < 0) return 0;

    float lo = best_axis == 0   ? cb.lo.x
               : best_axis == 1 ? cb.lo.y
                                : cb.lo.z;
    float hi = best_axis == 0   ? cb.hi.x
               : best_axis == 1 ? cb.hi.y
                                : cb.hi.z;
    float scale = NUM_BINS * (1.0f - 1e-6f) / (hi - lo);

    int32_t* mid = std::partition(idx, idx + n, [&](int32_t t) {
      const Vec3& c = centroid[t];
      float v = best_axis == 0 ? c.x : best_axis == 1 ? c.y : c.z;
      return std::min(int((v - lo) * scale), NUM_BINS - 1) <= best_bin;
    });
    int k = int(mid - idx);
    if (k == 0 || k == n) return 0;
    return k;
  }

  int split_or_median(int32_t* idx, int n) {
    int k = sah_split(idx, n);
    return k ? k : n / 2;
  }

  int build_node(int32_t* idx, int n) {
    struct Child {
      int32_t* ptr;
      int n;
    };
    Child children[WIDTH];
    int n_children = 1;
    children[0] = {idx, n};

    while (n_children < WIDTH) {
      int largest = 0;
      for (int i = 1; i < n_children; ++i)
        if (children[i].n > children[largest].n) largest = i;
      if (children[largest].n <= MAX_LEAF) break;
      Child big = children[largest];
      int k = split_or_median(big.ptr, big.n);
      // shift to make room
      for (int i = n_children; i > largest + 1; --i)
        children[i] = children[i - 1];
      children[largest] = {big.ptr, k};
      children[largest + 1] = {big.ptr + k, big.n - k};
      ++n_children;
    }

    int node_id = int(node_child.size() / WIDTH);
    node_bmin.resize(node_bmin.size() + WIDTH * 3, 0.f);
    node_bmax.resize(node_bmax.size() + WIDTH * 3, 0.f);
    node_child.resize(node_child.size() + WIDTH, -1);
    node_count.resize(node_count.size() + WIDTH, 0);

    for (int k = 0; k < n_children; ++k) {
      Bounds b = bounds_of(children[k].ptr, children[k].n);
      size_t base = (size_t(node_id) * WIDTH + k) * 3;
      node_bmin[base + 0] = b.lo.x;
      node_bmin[base + 1] = b.lo.y;
      node_bmin[base + 2] = b.lo.z;
      node_bmax[base + 0] = b.hi.x;
      node_bmax[base + 1] = b.hi.y;
      node_bmax[base + 2] = b.hi.z;

      if (children[k].n <= MAX_LEAF) {
        node_child[size_t(node_id) * WIDTH + k] = int32_t(leaf_tris.size());
        node_count[size_t(node_id) * WIDTH + k] = children[k].n;
        for (int i = 0; i < children[k].n; ++i)
          leaf_tris.push_back(children[k].ptr[i]);
        for (int i = children[k].n; i < MAX_LEAF; ++i) leaf_tris.push_back(0);
      } else {
        int cid = build_node(children[k].ptr, children[k].n);
        node_child[size_t(node_id) * WIDTH + k] = cid;
        node_count[size_t(node_id) * WIDTH + k] = 0;
      }
    }
    return node_id;
  }
};

}  // namespace

extern "C" {

void* bvh_build(const float* vertices, int64_t n_verts, const int32_t* faces,
                int64_t n_faces) {
  (void)n_verts;
  Builder* b = new Builder();
  b->prim_bounds.resize(n_faces);
  b->centroid.resize(n_faces);
  for (int64_t i = 0; i < n_faces; ++i) {
    Bounds pb;
    for (int k = 0; k < 3; ++k) {
      const float* v = vertices + size_t(faces[i * 3 + k]) * 3;
      pb.extend(Vec3(v[0], v[1], v[2]));
    }
    b->prim_bounds[i] = pb;
    b->centroid[i] = Vec3(0.5f * (pb.lo.x + pb.hi.x), 0.5f * (pb.lo.y + pb.hi.y),
                          0.5f * (pb.lo.z + pb.hi.z));
  }
  std::vector<int32_t> idx(n_faces);
  for (int64_t i = 0; i < n_faces; ++i) idx[i] = int32_t(i);

  // iterative wrapper not needed: depth is O(log n) for SAH splits with
  // median fallback, recursion is fine
  b->build_node(idx.data(), int(n_faces));
  return b;
}

void bvh_counts(void* handle, int64_t* n_nodes, int64_t* n_leaf) {
  Builder* b = static_cast<Builder*>(handle);
  *n_nodes = int64_t(b->node_child.size() / WIDTH);
  *n_leaf = int64_t(b->leaf_tris.size());
}

void bvh_export(void* handle, float* bmin, float* bmax, int32_t* child,
                int32_t* count, int32_t* leaf) {
  Builder* b = static_cast<Builder*>(handle);
  std::memcpy(bmin, b->node_bmin.data(), b->node_bmin.size() * sizeof(float));
  std::memcpy(bmax, b->node_bmax.data(), b->node_bmax.size() * sizeof(float));
  std::memcpy(child, b->node_child.data(),
              b->node_child.size() * sizeof(int32_t));
  std::memcpy(count, b->node_count.data(),
              b->node_count.size() * sizeof(int32_t));
  std::memcpy(leaf, b->leaf_tris.data(), b->leaf_tris.size() * sizeof(int32_t));
}

void bvh_free(void* handle) { delete static_cast<Builder*>(handle); }

}  // extern "C"
