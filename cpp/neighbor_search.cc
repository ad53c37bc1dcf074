// Native grid-hash fixed-radius neighbor search for the gaot_tpu host data
// pipeline. TPU-native equivalent of the reference's external native search
// kernels (torch_cluster CUDA `radius`, open3d FixedRadiusSearch; reference
// src/model/layers/utils/neighbor_search.py:50-180): graph construction runs
// on the host CPU, so the native code lives here rather than on the
// accelerator.
//
// Two-pass CSR interface (count, then fill) exposed via C ABI for ctypes.
// Multi-threaded over queries.

#include <algorithm>
#include <atomic>
#include <functional>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <unordered_map>
#include <utility>
#include <vector>

namespace {

struct Grid {
  const float* data;
  int64_t n;
  int dim;                  // 2 or 3
  float inv_cell;
  float lo[3];
  // cell key -> [start, end) into `order`
  std::unordered_map<uint64_t, std::pair<int64_t, int64_t>> buckets;
  std::vector<int64_t> order;

  static uint64_t key3(int64_t cx, int64_t cy, int64_t cz) {
    // 21 bits per axis, offset to keep non-negative.
    const uint64_t off = 1u << 20;
    return ((uint64_t)(cx + off) << 42) | ((uint64_t)(cy + off) << 21) |
           (uint64_t)(cz + off);
  }

  uint64_t cell_key(const float* p) const {
    int64_t cx = (int64_t)std::floor((p[0] - lo[0]) * inv_cell);
    int64_t cy = (int64_t)std::floor((p[1] - lo[1]) * inv_cell);
    int64_t cz = dim == 3 ? (int64_t)std::floor((p[2] - lo[2]) * inv_cell) : 0;
    return key3(cx, cy, cz);
  }

  void build(const float* d, int64_t n_, int dim_, float cell) {
    data = d;
    n = n_;
    dim = dim_;
    inv_cell = 1.0f / cell;
    lo[0] = lo[1] = lo[2] = 0.f;
    for (int k = 0; k < dim; ++k) {
      float mn = d[k];
      for (int64_t i = 1; i < n; ++i) mn = std::min(mn, d[i * dim + k]);
      lo[k] = mn - 1e-6f;
    }
    std::vector<uint64_t> keys(n);
    for (int64_t i = 0; i < n; ++i) keys[i] = cell_key(d + i * dim);

    std::unordered_map<uint64_t, int64_t> counts;
    counts.reserve(n * 2);
    for (int64_t i = 0; i < n; ++i) counts[keys[i]]++;
    buckets.reserve(counts.size() * 2);
    int64_t cursor = 0;
    for (auto& kv : counts) {
      buckets[kv.first] = {cursor, cursor};  // second acts as write cursor
      cursor += kv.second;
    }
    order.resize(n);
    for (int64_t i = 0; i < n; ++i) {
      auto& be = buckets[keys[i]];
      order[be.second++] = i;
    }
    // Reset starts: second is now end; recompute start from counts.
    for (auto& kv : buckets) {
      kv.second.first = kv.second.second - counts[kv.first];
    }
  }

  void base_cell(const float* q, int64_t* base) const {
    base[0] = base[1] = base[2] = 0;
    for (int k = 0; k < dim; ++k)
      base[k] = (int64_t)std::floor((q[k] - lo[k]) * inv_cell);
  }

  template <typename Fn>
  void for_each_in_cell(int64_t cx, int64_t cy, int64_t cz, Fn&& fn) const {
    auto it = buckets.find(key3(cx, cy, cz));
    if (it == buckets.end()) return;
    for (int64_t s = it->second.first; s < it->second.second; ++s) fn(order[s]);
  }

  template <typename Fn>
  void for_each_in_radius(const float* q, float radius, Fn&& fn) const {
    const float r2 = radius * radius;
    int64_t base[3] = {0, 0, 0};
    for (int k = 0; k < dim; ++k)
      base[k] = (int64_t)std::floor((q[k] - lo[k]) * inv_cell);
    const int64_t zlo = dim == 3 ? -1 : 0, zhi = dim == 3 ? 1 : 0;
    for (int64_t dx = -1; dx <= 1; ++dx)
      for (int64_t dy = -1; dy <= 1; ++dy)
        for (int64_t dz = zlo; dz <= zhi; ++dz) {
          auto it = buckets.find(key3(base[0] + dx, base[1] + dy, base[2] + dz));
          if (it == buckets.end()) continue;
          for (int64_t s = it->second.first; s < it->second.second; ++s) {
            const int64_t j = order[s];
            const float* p = data + j * dim;
            float d2 = 0.f;
            for (int k = 0; k < dim; ++k) {
              const float diff = p[k] - q[k];
              d2 += diff * diff;
            }
            if (d2 <= r2) fn(j);
          }
        }
  }
};

void parallel_for(int64_t count, const std::function<void(int64_t, int64_t)>& body) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t nthreads = std::max<int64_t>(1, std::min<int64_t>(hw, count));
  if (nthreads == 1) {
    body(0, count);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (count + nthreads - 1) / nthreads;
  for (int64_t t = 0; t < nthreads; ++t) {
    int64_t begin = t * chunk;
    int64_t end = std::min(count, begin + chunk);
    if (begin >= end) break;
    threads.emplace_back(body, begin, end);
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Pass 1: per-query neighbor counts. Returns 0 on success.
int gaot_radius_count(const float* data, int64_t n, const float* queries,
                      int64_t q, int dim, float radius, int64_t* counts) {
  if (dim != 2 && dim != 3) return 1;
  if (n == 0) {
    std::memset(counts, 0, sizeof(int64_t) * q);
    return 0;
  }
  Grid grid;
  grid.build(data, n, dim, radius);
  parallel_for(q, [&](int64_t begin, int64_t end) {
    for (int64_t i = begin; i < end; ++i) {
      int64_t c = 0;
      grid.for_each_in_radius(queries + i * dim, radius, [&](int64_t) { ++c; });
      counts[i] = c;
    }
  });
  return 0;
}

// Pass 2: fill neighbor indices given row_splits (exclusive prefix of counts).
int gaot_radius_fill(const float* data, int64_t n, const float* queries,
                     int64_t q, int dim, float radius,
                     const int64_t* row_splits, int64_t* out_index) {
  if (dim != 2 && dim != 3) return 1;
  if (n == 0) return 0;
  Grid grid;
  grid.build(data, n, dim, radius);
  parallel_for(q, [&](int64_t begin, int64_t end) {
    for (int64_t i = begin; i < end; ++i) {
      int64_t w = row_splits[i];
      grid.for_each_in_radius(queries + i * dim, radius,
                              [&](int64_t j) { out_index[w++] = j; });
    }
  });
  return 0;
}

// k nearest neighbors per query, rows sorted by (distance, index).
// `out_index` must hold q*k entries; requires 1 <= k <= n (the Python wrapper
// clamps k). Grid ring-expansion search: the cell size is chosen so a cell
// holds ~k points on average, and rings are expanded until the k-th best
// distance is provably closer than anything in the next unexplored ring
// (points in Chebyshev ring rho+1 are >= rho*cell away from the query).
int gaot_knn(const float* data, int64_t n, const float* queries, int64_t q,
             int dim, int64_t k, int64_t* out_index) {
  if (dim != 2 && dim != 3) return 1;
  if (k < 1 || k > n) return 3;

  // Bounding-box extents -> density-matched cell size.
  float lo[3] = {0, 0, 0}, hi[3] = {0, 0, 0};
  for (int a = 0; a < dim; ++a) {
    float mn = data[a], mx = data[a];
    for (int64_t i = 1; i < n; ++i) {
      const float v = data[i * dim + a];
      mn = std::min(mn, v);
      mx = std::max(mx, v);
    }
    lo[a] = mn;
    hi[a] = mx;
  }
  float ext_a[3] = {0, 0, 0};
  float max_extent = 0.f;
  for (int a = 0; a < dim; ++a) {
    ext_a[a] = std::max(hi[a] - lo[a], 0.f);
    max_extent = std::max(max_extent, ext_a[a]);
  }
  if (max_extent <= 0.f) max_extent = 1e-9f;
  // Density-matched cell over the NON-DEGENERATE axes only: for anisotropic
  // or near-degenerate point sets (points on a line/plane embedded in
  // 2D/3D), the dim-th root of the raw bbox volume collapses toward zero
  // and ring expansion then probes O(ring^(dim-1)) cells per ring for up to
  // ~1e6 rings per query. Points on a k'-dim manifold have density per
  // k'-volume, so use the product of live extents with the effective
  // dimension, and floor the cell so the grid never exceeds ~2048 cells
  // per axis.
  double prod = 1.0;
  int eff = 0;
  for (int a = 0; a < dim; ++a) {
    if (ext_a[a] > max_extent * 1e-4f) {
      prod *= (double)ext_a[a];
      ++eff;
    }
  }
  if (eff == 0) {
    prod = (double)max_extent;
    eff = 1;
  }
  float cell =
      (float)std::pow(prod * (double)k / (double)n, 1.0 / (double)eff);
  cell = std::max(cell, max_extent / 2048.f);

  Grid grid;
  grid.build(data, n, dim, cell);

  parallel_for(q, [&](int64_t begin, int64_t end) {
    // Max-heap of (dist2, index): top = current k-th best.
    std::vector<std::pair<float, int64_t>> heap;
    heap.reserve(k);
    for (int64_t i = begin; i < end; ++i) {
      const float* qp = queries + i * (int64_t)dim;
      heap.clear();
      int64_t base[3];
      grid.base_cell(qp, base);
      // Enough rings to reach every data cell even when the query sits far
      // outside the data bounding box.
      float reach = 0.f;
      for (int a = 0; a < dim; ++a)
        reach = std::max(reach, std::max(std::abs(qp[a] - lo[a]),
                                         std::abs(hi[a] - qp[a])));
      const int64_t max_ring = (int64_t)std::ceil(reach / cell) + 2;
      auto visit = [&](int64_t j) {
        const float* p = data + j * (int64_t)dim;
        float d2 = 0.f;
        for (int a = 0; a < dim; ++a) {
          const float diff = p[a] - qp[a];
          d2 += diff * diff;
        }
        const std::pair<float, int64_t> cand(d2, j);
        if ((int64_t)heap.size() < k) {
          heap.push_back(cand);
          std::push_heap(heap.begin(), heap.end());
        } else if (cand < heap.front()) {
          std::pop_heap(heap.begin(), heap.end());
          heap.back() = cand;
          std::push_heap(heap.begin(), heap.end());
        }
      };
      for (int64_t rho = 0; rho <= max_ring; ++rho) {
        if ((int64_t)heap.size() == k && rho > 0) {
          const float bound = (float)(rho - 1) * cell;
          if (heap.front().first <= bound * bound) break;
        }
        const int64_t zlo = dim == 3 ? -rho : 0, zhi = dim == 3 ? rho : 0;
        for (int64_t dx = -rho; dx <= rho; ++dx)
          for (int64_t dy = -rho; dy <= rho; ++dy)
            for (int64_t dz = zlo; dz <= zhi; ++dz) {
              const int64_t cheb = std::max(
                  std::abs(dx), std::max(std::abs(dy), std::abs(dz)));
              if (cheb != rho) continue;  // only the new shell
              grid.for_each_in_cell(base[0] + dx, base[1] + dy, base[2] + dz,
                                    visit);
            }
      }
      std::sort(heap.begin(), heap.end());
      // max_ring covers the whole box, so heap holds exactly k (k <= n);
      // defensively pad with -1 rather than skipping later queries.
      for (int64_t s = 0; s < k; ++s)
        out_index[i * k + s] =
            s < (int64_t)heap.size() ? heap[s].second : int64_t(-1);
    }
  });
  return 0;
}

}  // extern "C"
