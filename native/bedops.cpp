// Native genotype codec: threaded PLINK .bed decode / encode / column stats.
//
// The runtime equivalent of the reference's ArrayFire-backed host decode path
// (/root/reference/src/io/bed.rs:267-367): the Python layer keeps genotypes
// 2-bit packed; this library provides the hot host-side operations —
// per-column mean/std over the packed representation (needed once at load for
// every marker, io/bed.rs:231-242), bulk decode for submatrix extraction, and
// packing for writers — multithreaded and without materializing intermediate
// copies. Loaded via ctypes (rs_bann_tpu/io/native.py) with a NumPy fallback.
//
// 2-bit PLINK codes, lowest bit pair = first individual:
//   00 -> 2.0, 01 -> 0.0 (missing; impute beforehand), 10 -> 1.0, 11 -> 0.0

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

// byte -> 4 decoded genotype values, built once
struct Lut {
  float v[256][4];
  Lut() {
    static const float code_val[4] = {2.0f, 0.0f, 1.0f, 0.0f};
    for (int b = 0; b < 256; ++b)
      for (int i = 0; i < 4; ++i) v[b][i] = code_val[(b >> (2 * i)) & 3];
  }
};
const Lut kLut;

// genotype value -> 2-bit code (io/bed.rs:16)
inline uint8_t encode(float g) {
  int gi = static_cast<int>(g);
  return gi == 0 ? 3u : (gi == 1 ? 2u : 0u);
}

void parallel_for(int64_t n, const std::function<void(int64_t, int64_t)>& fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t nt = hw ? static_cast<int64_t>(hw) : 4;
  if (nt > n) nt = n > 0 ? n : 1;
  std::vector<std::thread> threads;
  int64_t chunk = (n + nt - 1) / nt;
  for (int64_t t = 0; t < nt; ++t) {
    int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back(fn, lo, hi);
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Decode markers [m, bytes_per_col] -> [m, n] f32.
void bed_decode(const uint8_t* data, int64_t m, int64_t bytes_per_col,
                int64_t n, float* out) {
  parallel_for(m, [&](int64_t lo, int64_t hi) {
    for (int64_t mi = lo; mi < hi; ++mi) {
      const uint8_t* col = data + mi * bytes_per_col;
      float* row = out + mi * n;
      int64_t i = 0;
      for (int64_t b = 0; b < bytes_per_col && i < n; ++b) {
        const float* four = kLut.v[col[b]];
        for (int k = 0; k < 4 && i < n; ++k) row[i++] = four[k];
      }
    }
  });
}

// Per-column mean and population std over packed data (io/bed.rs:231-242).
void bed_col_stats(const uint8_t* data, int64_t m, int64_t bytes_per_col,
                   int64_t n, float* means, float* stds) {
  parallel_for(m, [&](int64_t lo, int64_t hi) {
    for (int64_t mi = lo; mi < hi; ++mi) {
      const uint8_t* col = data + mi * bytes_per_col;
      // count occurrences of each 2-bit code; values are only {0,1,2} so the
      // moments come from counts, no per-individual float math
      int64_t cnt[4] = {0, 0, 0, 0};
      int64_t full = n / 4;
      for (int64_t b = 0; b < full; ++b) {
        uint8_t byte = col[b];
        ++cnt[byte & 3];
        ++cnt[(byte >> 2) & 3];
        ++cnt[(byte >> 4) & 3];
        ++cnt[(byte >> 6) & 3];
      }
      for (int64_t i = full * 4; i < n; ++i)
        ++cnt[(col[i / 4] >> (2 * (i % 4))) & 3];
      // code 00 -> 2, code 10 -> 1; codes 01/11 -> 0
      double n2 = static_cast<double>(cnt[0]);
      double n1 = static_cast<double>(cnt[2]);
      double mean = (2.0 * n2 + n1) / static_cast<double>(n);
      double ex2 = (4.0 * n2 + n1) / static_cast<double>(n);
      double var = ex2 - mean * mean;
      means[mi] = static_cast<float>(mean);
      stds[mi] = static_cast<float>(var > 0 ? std::sqrt(var) : 0.0);
    }
  });
}

// Standardized submatrix [n, k] for marker indices ixs (the reference's hot
// path, io/bed.rs:325-355), written column-contiguous into out[n*k] with
// layout out[i*k + j] (row-major individuals x markers).
void bed_submatrix_std(const uint8_t* data, int64_t bytes_per_col, int64_t n,
                       const int64_t* ixs, int64_t k, const float* means,
                       const float* stds, float* out) {
  parallel_for(k, [&](int64_t lo, int64_t hi) {
    for (int64_t j = lo; j < hi; ++j) {
      const uint8_t* col = data + ixs[j] * bytes_per_col;
      float mu = means[ixs[j]];
      float sd = stds[ixs[j]];
      float inv = sd > 0 ? 1.0f / sd : 0.0f;
      int64_t i = 0;
      for (int64_t b = 0; b < bytes_per_col && i < n; ++b) {
        const float* four = kLut.v[col[b]];
        for (int q = 0; q < 4 && i < n; ++q, ++i)
          out[i * k + j] = (four[q] - mu) * inv;
      }
    }
  });
}

// Pack genotype values [m, n] (0/1/2 as f32) -> [m, bytes_per_col].
void bed_pack(const float* vals, int64_t m, int64_t n, uint8_t* out) {
  int64_t bpc = (n + 3) / 4;
  parallel_for(m, [&](int64_t lo, int64_t hi) {
    for (int64_t mi = lo; mi < hi; ++mi) {
      const float* row = vals + mi * n;
      uint8_t* col = out + mi * bpc;
      std::memset(col, 0, static_cast<size_t>(bpc));
      for (int64_t i = 0; i < n; ++i)
        col[i / 4] |= static_cast<uint8_t>(encode(row[i]) << (2 * (i % 4)));
    }
  });
}

int bedops_version() { return 1; }

}  // extern "C"
