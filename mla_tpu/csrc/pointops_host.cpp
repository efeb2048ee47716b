// Host-side point-cloud ops for the data loader (C++), exposed via ctypes.
//
// Role: TPU-native stand-ins for the reference's native extensions
// (SURVEY.md section 2.9) on the HOST side of the pipeline:
//   * grid_subsample  — voxel-grid point subsampling; replaces
//     vla/datasets/cpp/subsampling (nanoflann-based CPython extension).
//   * fps             — farthest point sampling; replaces the CPU role of
//     vla/datasets/cpp/pointops/src/sampling (the on-device hot path is the
//     Pallas/jit kernel in mla_tpu/ops/pointops.py).
//   * knn             — brute-force k-nearest-neighbors for host-side
//     preprocessing; replaces pointops knnquery on the host.
//   * chamfer         — bidirectional chamfer distance for eval tooling;
//     replaces vla/datasets/cpp/chamfer_dist on the host.
//
// All functions are plain C ABI over contiguous float32/int32 buffers so the
// python side needs only ctypes (no pybind11 in the image).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <unordered_map>
#include <vector>
#include <limits>

extern "C" {

// Voxel-grid subsampling: keep the first point that lands in each voxel
// (deterministic given input order). Returns the number of selected points
// (<= max_out); indices written to out_idx.
int grid_subsample(const float* pts, int n, float cell, int* out_idx, int max_out) {
  if (n <= 0 || cell <= 0.f || max_out <= 0) return 0;
  std::unordered_map<uint64_t, int> seen;
  seen.reserve(static_cast<size_t>(n));
  int count = 0;
  for (int i = 0; i < n && count < max_out; ++i) {
    const float* p = pts + 3 * i;
    // 21 bits per axis around a +/-2^20-cell origin offset
    const int64_t gx = static_cast<int64_t>(std::floor(p[0] / cell)) + (1 << 20);
    const int64_t gy = static_cast<int64_t>(std::floor(p[1] / cell)) + (1 << 20);
    const int64_t gz = static_cast<int64_t>(std::floor(p[2] / cell)) + (1 << 20);
    const uint64_t key = (static_cast<uint64_t>(gx) & 0x1FFFFF) |
                         ((static_cast<uint64_t>(gy) & 0x1FFFFF) << 21) |
                         ((static_cast<uint64_t>(gz) & 0x1FFFFF) << 42);
    auto it = seen.find(key);
    if (it == seen.end()) {
      seen.emplace(key, i);
      out_idx[count++] = i;
    }
  }
  return count;
}

// Farthest point sampling, deterministic start at index `start`.
// Matches the iterative min-distance/argmax algorithm the model-side kernel
// implements (mla_tpu/ops/pointops.py furthest_point_sample).
void fps(const float* pts, int n, int m, int start, int* out_idx) {
  if (n <= 0 || m <= 0) return;
  std::vector<float> dist(static_cast<size_t>(n), std::numeric_limits<float>::max());
  int farthest = start < n ? start : 0;
  for (int s = 0; s < m; ++s) {
    out_idx[s] = farthest;
    const float* c = pts + 3 * farthest;
    float best = -1.f;
    int best_i = 0;
    for (int i = 0; i < n; ++i) {
      const float* p = pts + 3 * i;
      const float dx = p[0] - c[0], dy = p[1] - c[1], dz = p[2] - c[2];
      const float d = dx * dx + dy * dy + dz * dz;
      if (d < dist[i]) dist[i] = d;
      if (dist[i] > best) { best = dist[i]; best_i = i; }
    }
    farthest = best_i;
  }
}

// Brute-force kNN: for each of q queries, the k nearest of n points.
// out_idx is [q, k] row-major, sorted by distance ascending.
void knn(const float* pts, int n, const float* queries, int q, int k, int* out_idx) {
  if (n <= 0 || q <= 0 || k <= 0) return;
  const int kk = k < n ? k : n;
  std::vector<std::pair<float, int>> heap(static_cast<size_t>(kk));
  for (int j = 0; j < q; ++j) {
    const float* Q = queries + 3 * j;
    // simple selection via insertion into a sorted small array (k is small)
    int filled = 0;
    for (int i = 0; i < n; ++i) {
      const float* p = pts + 3 * i;
      const float dx = p[0] - Q[0], dy = p[1] - Q[1], dz = p[2] - Q[2];
      const float d = dx * dx + dy * dy + dz * dz;
      if (filled < kk) {
        int pos = filled++;
        while (pos > 0 && heap[pos - 1].first > d) { heap[pos] = heap[pos - 1]; --pos; }
        heap[pos] = {d, i};
      } else if (d < heap[kk - 1].first) {
        int pos = kk - 1;
        while (pos > 0 && heap[pos - 1].first > d) { heap[pos] = heap[pos - 1]; --pos; }
        heap[pos] = {d, i};
      }
    }
    for (int s = 0; s < k; ++s) out_idx[j * k + s] = heap[s < kk ? s : kk - 1].second;
  }
}

// Bidirectional chamfer distance (euclidean), mean-of-min form matching the
// active reference loss (models/mla/generation/gen_loss.py:12-18).
float chamfer(const float* a, int n, const float* b, int m) {
  if (n <= 0 || m <= 0) return 0.f;
  double fwd = 0.0, bwd = 0.0;
  std::vector<float> min_b(static_cast<size_t>(m), std::numeric_limits<float>::max());
  for (int i = 0; i < n; ++i) {
    const float* p = a + 3 * i;
    float best = std::numeric_limits<float>::max();
    for (int j = 0; j < m; ++j) {
      const float* qp = b + 3 * j;
      const float dx = p[0] - qp[0], dy = p[1] - qp[1], dz = p[2] - qp[2];
      const float d = dx * dx + dy * dy + dz * dz;
      if (d < best) best = d;
      if (d < min_b[j]) min_b[j] = d;
    }
    fwd += std::sqrt(static_cast<double>(best));
  }
  for (int j = 0; j < m; ++j) bwd += std::sqrt(static_cast<double>(min_b[j]));
  return static_cast<float>(fwd / n + bwd / m);
}

}  // extern "C"
