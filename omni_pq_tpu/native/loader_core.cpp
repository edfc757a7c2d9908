// Native data-loader core: the host-side per-scene hot ops.
//
// The reference leans on torch's C++ DataLoader workers for its input
// pipeline; here the equivalent native tier is this small library, called
// from the Python loader via ctypes (calls release the GIL, so the
// PrefetchLoader's worker threads get real parallelism):
//   - morton_argsort: Morton-code spatial ordering of a cloud
//     (data/spatial.py semantics)
//   - compute_votes: per-point vote targets from instance membership
//     (scannet_detection_dataset.py:229-246 semantics — the per-instance
//     Python loop is the slowest part of a scene load)
//   - random_sample_gather: downsample-with-choices gather
//
// Build: g++ -O3 -march=native -shared -fPIC loader_core.cpp -o libloader_core.so
#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

static inline uint64_t spread_bits(uint64_t v) {
  v &= 0x3FF;
  v = (v | (v << 16)) & 0x030000FF;
  v = (v | (v << 8)) & 0x0300F00F;
  v = (v | (v << 4)) & 0x030C30C3;
  v = (v | (v << 2)) & 0x09249249;
  return v;
}

// points: (n, stride) float32, first 3 columns are xyz; out_order: (n,) int64
void morton_argsort(const float* points, int64_t n, int64_t stride,
                    int64_t* out_order) {
  if (n == 0) return;
  float lo[3] = {points[0], points[1], points[2]};
  float hi[3] = {points[0], points[1], points[2]};
  for (int64_t i = 0; i < n; ++i) {
    for (int d = 0; d < 3; ++d) {
      float v = points[i * stride + d];
      lo[d] = std::min(lo[d], v);
      hi[d] = std::max(hi[d], v);
    }
  }
  std::vector<uint64_t> codes(n);
  float scale[3];
  for (int d = 0; d < 3; ++d)
    scale[d] = hi[d] > lo[d] ? 1023.0f / (hi[d] - lo[d]) : 0.0f;
  for (int64_t i = 0; i < n; ++i) {
    uint64_t q[3];
    for (int d = 0; d < 3; ++d) {
      float v = (points[i * stride + d] - lo[d]) * scale[d];
      v = std::max(0.0f, std::min(1023.0f, v));
      q[d] = (uint64_t)v;
    }
    codes[i] = spread_bits(q[0]) | (spread_bits(q[1]) << 1)
             | (spread_bits(q[2]) << 2);
  }
  std::iota(out_order, out_order + n, 0);
  std::stable_sort(out_order, out_order + n, [&](int64_t a, int64_t b) {
    return codes[a] < codes[b];
  });
}

// pc (n,3) f32, instance (n,) i64, sem_in_care (n,) uint8 (1 = semantic class
// belongs to the detection set), gt_centers (k,3) f32 (padded far away),
// outputs: votes (n,3) f32, votes_mask (n,) f32, point_instance (n,) i64
void compute_votes(const float* pc, const int64_t* instance,
                   const uint8_t* sem_in_care, int64_t n,
                   const float* gt_centers, int64_t k,
                   float* votes, float* votes_mask, int64_t* point_instance) {
  std::memset(votes, 0, sizeof(float) * n * 3);
  std::memset(votes_mask, 0, sizeof(float) * n);
  for (int64_t i = 0; i < n; ++i) point_instance[i] = -1;

  // group point indices by instance id
  int64_t max_inst = -1;
  for (int64_t i = 0; i < n; ++i) max_inst = std::max(max_inst, instance[i]);
  if (max_inst < 0) return;
  std::vector<std::vector<int64_t>> groups(max_inst + 1);
  for (int64_t i = 0; i < n; ++i)
    if (instance[i] >= 0) groups[instance[i]].push_back(i);

  for (int64_t g = 0; g <= max_inst; ++g) {
    const auto& idx = groups[g];
    if (idx.empty()) continue;
    if (!sem_in_care[idx[0]]) continue;  // first point decides, like the ref
    float mn[3], mx[3];
    for (int d = 0; d < 3; ++d) mn[d] = mx[d] = pc[idx[0] * 3 + d];
    for (int64_t i : idx) {
      for (int d = 0; d < 3; ++d) {
        mn[d] = std::min(mn[d], pc[i * 3 + d]);
        mx[d] = std::max(mx[d], pc[i * 3 + d]);
      }
    }
    float center[3] = {(mn[0] + mx[0]) * 0.5f, (mn[1] + mx[1]) * 0.5f,
                       (mn[2] + mx[2]) * 0.5f};
    // nearest gt center -> instance label
    int64_t best = 0;
    float bestd = 3.4e38f;
    for (int64_t j = 0; j < k; ++j) {
      float d2 = 0;
      for (int d = 0; d < 3; ++d) {
        float diff = center[d] - gt_centers[j * 3 + d];
        d2 += diff * diff;
      }
      if (d2 < bestd) { bestd = d2; best = j; }
    }
    for (int64_t i : idx) {
      for (int d = 0; d < 3; ++d)
        votes[i * 3 + d] = center[d] - pc[i * 3 + d];
      votes_mask[i] = 1.0f;
      point_instance[i] = best;
    }
  }
}

// src (n, c) f32, choices (m,) i64 -> dst (m, c) f32
void gather_rows(const float* src, int64_t n, int64_t c,
                 const int64_t* choices, int64_t m, float* dst) {
  for (int64_t i = 0; i < m; ++i)
    std::memcpy(dst + i * c, src + choices[i] * c, sizeof(float) * c);
}

}  // extern "C"
