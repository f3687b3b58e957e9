// Native coordinate-map engine for COO sparse convolution.
//
// The TPU-native counterpart of MinkowskiEngine's C++ coordinate manager:
// given the COO coordinates of occupied sites on a (batch, H, W) grid, it
// enumerates the kernel-dilated output coordinate set and emits, for every
// kernel offset, the (input row, output row) pair list ("kernel map") that
// the device-side gather-matmul-scatter consumes (ops/coo_conv.py).
//
// Exposed as a plain C ABI for ctypes.  Convention matches the dense engine
// in ops/sparse.py: out[o] = sum_j in[o*s - lo + j] * W[j] with lo = k/2 for
// odd kernels and 0 for even ones, i.e. input i feeds output (i + lo - j)
// through weight index j.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstddef>
#include <cstdint>
#include <unordered_map>
#include <vector>

namespace {

inline int64_t pack_key(int64_t owner, int64_t x, int64_t y) {
  return (owner << 40) | (x << 20) | y;
}

}  // namespace

extern "C" {

// Phase 1+2 in one call with caller-allocated worst-case buffers.
//
// Inputs:
//   coords      [n * 3] int64 (owner, x, y)
//   n, kernel, stride, height, width
// Outputs (caller allocates):
//   out_coords  [n * kernel * kernel * 3] int64 — first M rows valid
//   pair_in     [n * kernel * kernel] int32 — grouped by kernel offset
//   pair_out    [n * kernel * kernel] int32
//   pair_counts [kernel * kernel] int64 — pairs per offset
// Returns M (number of output sites), or -1 on error.
int64_t tcvn_build_conv_maps(const int64_t* coords, int64_t n, int64_t kernel,
                             int64_t stride, int64_t height, int64_t width,
                             int64_t* out_coords, int32_t* pair_in,
                             int32_t* pair_out, int64_t* pair_counts) {
  if (n < 0 || kernel <= 0 || stride <= 0) return -1;
  const int64_t lo = (kernel % 2 == 1) ? kernel / 2 : 0;
  const int64_t volume = kernel * kernel;

  std::unordered_map<int64_t, int32_t> site_index;
  site_index.reserve(static_cast<size_t>(n) * 4);
  int64_t num_out = 0;
  int64_t cursor = 0;

  for (int64_t j = 0; j < volume; ++j) {
    const int64_t dx = lo - j / kernel;
    const int64_t dy = lo - j % kernel;
    int64_t count = 0;
    for (int64_t i = 0; i < n; ++i) {
      const int64_t owner = coords[3 * i];
      const int64_t ox = coords[3 * i + 1] + dx;
      const int64_t oy = coords[3 * i + 2] + dy;
      if (ox < 0 || ox >= height || oy < 0 || oy >= width) continue;
      if (stride > 1 && (ox % stride != 0 || oy % stride != 0)) continue;

      const int64_t key = pack_key(owner, ox, oy);
      auto it = site_index.find(key);
      int32_t row;
      if (it == site_index.end()) {
        row = static_cast<int32_t>(num_out);
        site_index.emplace(key, row);
        out_coords[3 * num_out] = owner;
        out_coords[3 * num_out + 1] = ox / stride;
        out_coords[3 * num_out + 2] = oy / stride;
        ++num_out;
      } else {
        row = it->second;
      }
      pair_in[cursor] = static_cast<int32_t>(i);
      pair_out[cursor] = row;
      ++cursor;
      ++count;
    }
    pair_counts[j] = count;
  }
  return num_out;
}

// Batched CSR slicing: copy [first, last) ranges from a COO bank into a
// contiguous output with a per-hit owner column — the hot host-side loop of
// the data pipeline (dataset.gather_events).
//
//   ranges      [m * 2] int64 — (first, last) per event
//   coords_in   [total * 3] int64, values_in [total * c] float32
//   coords_out / values_out / owner_out — caller-allocated (sum of ranges)
// Returns number of hits copied.
int64_t tcvn_gather_ranges(const int64_t* ranges, int64_t m,
                           const int64_t* coords_in, const float* values_in,
                           int64_t c, int64_t* coords_out, float* values_out,
                           int64_t* owner_out) {
  int64_t cursor = 0;
  for (int64_t row = 0; row < m; ++row) {
    const int64_t first = ranges[2 * row];
    const int64_t last = ranges[2 * row + 1];
    for (int64_t i = first; i < last; ++i) {
      coords_out[3 * cursor] = coords_in[3 * i];
      coords_out[3 * cursor + 1] = coords_in[3 * i + 1];
      coords_out[3 * cursor + 2] = coords_in[3 * i + 2];
      for (int64_t k = 0; k < c; ++k) {
        values_out[c * cursor + k] = values_in[c * i + k];
      }
      owner_out[cursor] = row;
      ++cursor;
    }
  }
  return cursor;
}

}  // extern "C"
