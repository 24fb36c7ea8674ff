// Native host-side data-path kernels for dh3d_tpu.
//
// The reference's training dataflow runs a hot host loop per sample
// (SURVEY.md §3.1): farthest-point sampling of anchor nodes + KD-tree 1-NN
// correspondence search (core/datasets.py:143-150), plus eval-time voxel
// downsampling / radius outlier removal done there with open3d
// (core/utils.py:165-177). These are the C++ equivalents, exposed via a
// plain C ABI for ctypes; dh3d_tpu/native.py falls back to numpy when this
// library is not built.
//
// Build: make -C native      (produces libdh3d_native.so)

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

inline float sqdist(const float* a, const float* b) {
  const float dx = a[0] - b[0];
  const float dy = a[1] - b[1];
  const float dz = a[2] - b[2];
  return dx * dx + dy * dy + dz * dz;
}

// Simple uniform-grid spatial hash over 3D points for neighbor queries.
struct Grid {
  float cell;
  std::unordered_map<uint64_t, std::vector<int>> cells;
  const float* pts;
  int n;

  static uint64_t key(int64_t ix, int64_t iy, int64_t iz) {
    // 21 bits per axis, offset to keep positive
    const uint64_t bias = 1u << 20;
    return ((uint64_t)(ix + bias) << 42) | ((uint64_t)(iy + bias) << 21) |
           (uint64_t)(iz + bias);
  }

  Grid(const float* p, int count, float cell_size)
      : cell(cell_size), pts(p), n(count) {
    cells.reserve(count);
    for (int i = 0; i < count; ++i) {
      const float* q = p + 3 * i;
      cells[key((int64_t)std::floor(q[0] / cell),
                (int64_t)std::floor(q[1] / cell),
                (int64_t)std::floor(q[2] / cell))]
          .push_back(i);
    }
  }

  // Visit all points in cells overlapping the radius-box around q.  When
  // the box would cover more cells than are occupied (far-away or huge
  // radius), walk every point instead — caps the O((r/cell)^3) blowup at
  // O(n) while staying exact.
  template <typename F>
  void for_neighbors(const float* q, float radius, F&& fn) const {
    const int64_t x0 = (int64_t)std::floor((q[0] - radius) / cell);
    const int64_t x1 = (int64_t)std::floor((q[0] + radius) / cell);
    const int64_t y0 = (int64_t)std::floor((q[1] - radius) / cell);
    const int64_t y1 = (int64_t)std::floor((q[1] + radius) / cell);
    const int64_t z0 = (int64_t)std::floor((q[2] - radius) / cell);
    const int64_t z1 = (int64_t)std::floor((q[2] + radius) / cell);
    const int64_t volume = (x1 - x0 + 1) * (y1 - y0 + 1) * (z1 - z0 + 1);
    if (volume > (int64_t)cells.size() * 4) {
      for (const auto& kv : cells)
        for (int j : kv.second) fn(j);
      return;
    }
    for (int64_t ix = x0; ix <= x1; ++ix)
      for (int64_t iy = y0; iy <= y1; ++iy)
        for (int64_t iz = z0; iz <= z1; ++iz) {
          auto it = cells.find(key(ix, iy, iz));
          if (it == cells.end()) continue;
          for (int j : it->second) fn(j);
        }
  }
};

}  // namespace

extern "C" {

// Farthest point sampling: same algorithm as the device kernels
// (tf_sampling_g.cu:105-170 analog): seed at seed_idx, then iteratively the
// argmax of the running min squared distance. O(n*m).
void dh3d_fps(const float* pts, int n, int m, int seed_idx, int32_t* out) {
  std::vector<float> mind(n, FLT_MAX);
  int last = seed_idx;
  out[0] = (int32_t)last;
  for (int j = 1; j < m; ++j) {
    const float* lp = pts + 3 * last;
    float best = -1.0f;
    int besti = 0;
    for (int i = 0; i < n; ++i) {
      const float d = sqdist(pts + 3 * i, lp);
      if (d < mind[i]) mind[i] = d;
      if (mind[i] > best) {
        best = mind[i];
        besti = i;
      }
    }
    last = besti;
    out[j] = (int32_t)besti;
  }
}

// 1-NN correspondence search: for each query, index of nearest ref point.
// Grid-accelerated with brute-force fallback (core/datasets.py:148-150's
// KDTree.query(k=1) equivalent).
void dh3d_nn1(const float* query, int nq, const float* ref, int nr,
              float cell, int32_t* out_idx, float* out_dist) {
  Grid grid(ref, nr, cell > 0 ? cell : 1.0f);
  for (int i = 0; i < nq; ++i) {
    const float* q = query + 3 * i;
    float best = FLT_MAX;
    int besti = -1;
    auto update = [&](int j) {
      const float d = sqdist(q, ref + 3 * j);
      if (d < best || (d == best && j < besti)) {
        best = d;
        besti = j;
      }
    };
    // phase 1: expanding-radius search until ANY candidate is found
    float radius = grid.cell;
    while (besti < 0 && radius <= 1e6f) {
      grid.for_neighbors(q, radius, update);
      radius *= 2.0f;
    }
    if (besti < 0) {  // degenerate cloud: brute force
      for (int j = 0; j < nr; ++j) update(j);
    } else if (best > 0.0f) {
      // phase 2: the true nearest may sit in a cell not yet scanned —
      // one final pass with radius = dist(candidate) guarantees coverage
      const float final_r = std::sqrt(best);
      if (final_r > radius / 2.0f) grid.for_neighbors(q, final_r, update);
    }
    out_idx[i] = (int32_t)besti;
    if (out_dist) out_dist[i] = std::sqrt(best);
  }
}

// Brute-force kNN (ascending, self included): host fallback with the same
// semantics as user_ops knn_bruteforce (knn_bruteforce_kernel.cc:41-70).
void dh3d_knn(const float* pts, int n, int k, int32_t* out_idx,
              float* out_dist) {
  std::vector<std::pair<float, int>> cand(n);
  for (int i = 0; i < n; ++i) {
    const float* q = pts + 3 * i;
    for (int j = 0; j < n; ++j) cand[j] = {sqdist(q, pts + 3 * j), j};
    std::partial_sort(
        cand.begin(), cand.begin() + k, cand.end(),
        [](const auto& a, const auto& b) {
          return a.first < b.first ||
                 (a.first == b.first && a.second < b.second);
        });
    for (int j = 0; j < k; ++j) {
      out_idx[(int64_t)i * k + j] = (int32_t)cand[j].second;
      if (out_dist) out_dist[(int64_t)i * k + j] = std::sqrt(cand[j].first);
    }
  }
}

// Voxel-grid downsample (mean of points per voxel, open3d
// voxel_down_sample equivalent, core/utils.py:165-170). Returns the number
// of voxels written (caller provides out sized >= n).
int dh3d_voxel_downsample(const float* pts, int n, float voxel, float* out) {
  std::unordered_map<uint64_t, int> slot;
  std::vector<double> sums;
  std::vector<int> counts;
  std::vector<uint64_t> order;
  slot.reserve(n);
  for (int i = 0; i < n; ++i) {
    const float* q = pts + 3 * i;
    const uint64_t k = Grid::key((int64_t)std::floor(q[0] / voxel),
                                 (int64_t)std::floor(q[1] / voxel),
                                 (int64_t)std::floor(q[2] / voxel));
    auto it = slot.find(k);
    int s;
    if (it == slot.end()) {
      s = (int)counts.size();
      slot.emplace(k, s);
      sums.insert(sums.end(), {0.0, 0.0, 0.0});
      counts.push_back(0);
      order.push_back(k);
    } else {
      s = it->second;
    }
    sums[3 * s] += q[0];
    sums[3 * s + 1] += q[1];
    sums[3 * s + 2] += q[2];
    counts[s] += 1;
  }
  const int m = (int)counts.size();
  for (int s = 0; s < m; ++s) {
    out[3 * s] = (float)(sums[3 * s] / counts[s]);
    out[3 * s + 1] = (float)(sums[3 * s + 1] / counts[s]);
    out[3 * s + 2] = (float)(sums[3 * s + 2] / counts[s]);
  }
  return m;
}

// Radius outlier removal: keep points with >= nb_points OTHER points within
// radius (open3d remove_radius_outlier equivalent, core/utils.py:173-177).
// Writes keep-indices; returns how many.
int dh3d_radius_outlier(const float* pts, int n, int nb_points, float radius,
                        int32_t* keep) {
  Grid grid(pts, n, radius);
  const float r2 = radius * radius;
  int m = 0;
  for (int i = 0; i < n; ++i) {
    const float* q = pts + 3 * i;
    int count = -1;  // exclude self
    grid.for_neighbors(q, radius, [&](int j) {
      if (sqdist(q, pts + 3 * j) <= r2) ++count;
    });
    if (count >= nb_points) keep[m++] = (int32_t)i;
  }
  return m;
}

}  // extern "C"
