// Baseline grounding (VERDICT r2 #4): measure the reference's CPU-resident
// in-graph ops at model shapes on a modern host.
//
// The reference graph runs three_nn + three_interpolate on the CPU (the ops
// have no CUDA kernel: /root/reference/tf_ops/interpolation/tf_interpolate.cpp
// registers CPU kernels only), forcing a GPU->CPU->GPU round trip in every
// forward (SURVEY.md §3.1).  threenn_cpu is a single-threaded scalar
// brute-force scan (tf_interpolate.cpp:60-103); threeinterpolate_cpu a
// scalar weighted gather (:107-127).  This program re-implements those
// semantics (fresh code, same algorithmic structure: full scan per query
// with a running 3-best; scalar weighted sum per channel) and times them at
// the shapes the DH3D forward uses, giving a HARD LOWER BOUND on the
// reference's per-step host time — independent of its GPU.
//
// Build/run:  g++ -O3 -march=native scripts/ref_cpu_bound.cc -o /tmp/refb && /tmp/refb
#include <chrono>
#include <cstdio>
#include <random>
#include <vector>

using clk = std::chrono::steady_clock;

static void three_nn(int b, int n, int m, const float* q, const float* k,
                     float* dist, int* idx) {
  for (int bi = 0; bi < b; ++bi, q += n * 3, k += m * 3, dist += n * 3,
           idx += n * 3) {
    for (int j = 0; j < n; ++j) {
      const float x = q[j * 3], y = q[j * 3 + 1], z = q[j * 3 + 2];
      double b1 = 1e40, b2 = 1e40, b3 = 1e40;
      int i1 = 0, i2 = 0, i3 = 0;
      for (int t = 0; t < m; ++t) {
        const float dx = k[t * 3] - x, dy = k[t * 3 + 1] - y,
                    dz = k[t * 3 + 2] - z;
        const double d = double(dx) * dx + double(dy) * dy + double(dz) * dz;
        if (d < b1) {
          b3 = b2; i3 = i2; b2 = b1; i2 = i1; b1 = d; i1 = t;
        } else if (d < b2) {
          b3 = b2; i3 = i2; b2 = d; i2 = t;
        } else if (d < b3) {
          b3 = d; i3 = t;
        }
      }
      dist[j * 3] = float(b1); dist[j * 3 + 1] = float(b2);
      dist[j * 3 + 2] = float(b3);
      idx[j * 3] = i1; idx[j * 3 + 1] = i2; idx[j * 3 + 2] = i3;
    }
  }
}

static void three_interp(int b, int m, int c, int n, const float* pts,
                         const int* idx, const float* w, float* out) {
  for (int bi = 0; bi < b; ++bi, pts += m * c, idx += n * 3, w += n * 3,
           out += n * c) {
    for (int j = 0; j < n; ++j) {
      const float w1 = w[j * 3], w2 = w[j * 3 + 1], w3 = w[j * 3 + 2];
      const int i1 = idx[j * 3], i2 = idx[j * 3 + 1], i3 = idx[j * 3 + 2];
      for (int l = 0; l < c; ++l)
        out[j * c + l] = pts[i1 * c + l] * w1 + pts[i2 * c + l] * w2 +
                         pts[i3 * c + l] * w3;
    }
  }
}

int main() {
  const int B = 20, N = 8192, M = 1024;
  std::mt19937 rng(0);
  std::uniform_real_distribution<float> U(-20.f, 20.f);
  std::vector<float> q(B * N * 3), k(B * M * 3), dist(B * N * 3);
  std::vector<int> idx(B * N * 3);
  for (auto& v : q) v = U(rng);
  for (auto& v : k) v = U(rng);

  // warm
  three_nn(1, N, M, q.data(), k.data(), dist.data(), idx.data());
  auto t0 = clk::now();
  const int R = 3;
  for (int r = 0; r < R; ++r)
    three_nn(B, N, M, q.data(), k.data(), dist.data(), idx.data());
  double nn_ms =
      std::chrono::duration<double, std::milli>(clk::now() - t0).count() / R;

  for (int C : {128, 256}) {
    std::vector<float> pts(B * M * C), w(B * N * 3, 1.f / 3), out(B * N * C);
    for (auto& v : pts) v = U(rng);
    three_interp(1, M, C, N, pts.data(), idx.data(), w.data(), out.data());
    auto t1 = clk::now();
    for (int r = 0; r < R; ++r)
      three_interp(B, M, C, N, pts.data(), idx.data(), w.data(), out.data());
    double ip_ms =
        std::chrono::duration<double, std::milli>(clk::now() - t1).count() / R;
    printf("three_interpolate C=%d  [%d,%d<-%d]: %.1f ms\n", C, B, N, M,
           ip_ms);
  }
  printf("three_nn [%d,%d,%d]: %.1f ms  (reference graph runs this %s)\n", B,
         N, M, nn_ms, "twice per forward: stage2 + global stage");
  return 0;
}
