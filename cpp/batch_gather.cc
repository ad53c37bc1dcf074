// Multi-threaded row gather for host-side batch assembly.
//
// TPU-native replacement for the reference's multi-worker torch DataLoader
// collate path (src/core/default_configs.py:68 `num_workers`,
// src/datasets/data_processor.py:323-378): batches are assembled by copying
// sample rows (possibly tens of MB for vx graph batches) from the in-memory
// dataset into a contiguous buffer. NumPy fancy indexing does this on one
// core; this kernel fans the row copies across threads and is driven from
// gaot_tpu/data/loader.py via ctypes, overlapped with the device step by
// PrefetchLoader.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

void copy_range(const char* src, int64_t row_bytes, const int64_t* idx,
                int64_t begin, int64_t end, char* dst) {
  for (int64_t i = begin; i < end; ++i) {
    std::memcpy(dst + i * row_bytes, src + idx[i] * row_bytes,
                static_cast<size_t>(row_bytes));
  }
}

}  // namespace

extern "C" {

// dst[i, :] = src[idx[i], :] for i in [0, n_idx); rows are row_bytes wide,
// src has src_rows rows. Returns 0 on success, 1 on bad arguments, 2 if any
// index is out of range (preserving NumPy's IndexError contract instead of
// reading out of bounds).
int gaot_gather_rows(const void* src, int64_t src_rows, int64_t row_bytes,
                     const int64_t* idx, int64_t n_idx, void* dst,
                     int num_threads) {
  if (row_bytes <= 0 || n_idx < 0 || src_rows < 0) return 1;
  for (int64_t i = 0; i < n_idx; ++i) {
    if (idx[i] < 0 || idx[i] >= src_rows) return 2;
  }
  const char* s = static_cast<const char*>(src);
  char* d = static_cast<char*>(dst);
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  int nt = num_threads > 0 ? num_threads : std::max(1, hw / 2);
  // Not worth spawning threads for small copies.
  if (n_idx * row_bytes < (4 << 20) || nt == 1) {
    copy_range(s, row_bytes, idx, 0, n_idx, d);
    return 0;
  }
  nt = static_cast<int>(std::min<int64_t>(nt, n_idx));
  std::vector<std::thread> threads;
  threads.reserve(nt);
  int64_t chunk = (n_idx + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t b = t * chunk;
    int64_t e = std::min(n_idx, b + chunk);
    if (b >= e) break;
    threads.emplace_back(copy_range, s, row_bytes, idx, b, e, d);
  }
  for (auto& th : threads) th.join();
  return 0;
}

}  // extern "C"
