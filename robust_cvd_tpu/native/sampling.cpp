// Native helpers for constraint building — the only genuinely sequential
// parts of the pipeline (greedy corner-strength-ordered sampling with disk
// suppression, reference lib/FlowConstraints.cpp:352-397, and disk stamping
// for static-flag pruning, reference .cpp:662-748).
//
// Everything dense/parallel (corner response, candidate filtering, masks)
// runs as batched JAX programs on the TPU; these loops run once per clip on
// the host and are O(candidates).
//
// Built as a plain shared library, loaded via ctypes (no pybind11 in this
// environment).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Greedy selection of candidates (already sorted by descending corner
// strength). Marks selected[i] = 1 for kept candidates; suppresses any later
// candidate whose reference pixel falls within a disk of `radius` around a
// kept one.
void greedy_sample(
    const int32_t* xs,
    const int32_t* ys,
    int64_t n,
    int32_t w,
    int32_t h,
    int32_t radius,
    uint8_t* selected) {
  std::vector<uint8_t> invalid(static_cast<size_t>(w) * h, 0);
  const int64_t r2 = static_cast<int64_t>(radius) * radius;

  for (int64_t i = 0; i < n; ++i) {
    const int32_t x = xs[i];
    const int32_t y = ys[i];
    if (x < 0 || x >= w || y < 0 || y >= h) {
      selected[i] = 0;
      continue;
    }
    if (invalid[static_cast<size_t>(y) * w + x]) {
      selected[i] = 0;
      continue;
    }
    selected[i] = 1;

    const int32_t mx0 = x - radius < 0 ? 0 : x - radius;
    const int32_t mx1 = x + radius >= w ? w - 1 : x + radius;
    const int32_t my0 = y - radius < 0 ? 0 : y - radius;
    const int32_t my1 = y + radius >= h ? h - 1 : y + radius;
    for (int32_t my = my0; my <= my1; ++my) {
      const int64_t dy = my - y;
      uint8_t* row = invalid.data() + static_cast<size_t>(my) * w;
      for (int32_t mx = mx0; mx <= mx1; ++mx) {
        const int64_t dx = mx - x;
        if (dx * dx + dy * dy <= r2) {
          row[mx] = 1;
        }
      }
    }
  }
}

// Stamp disks of `radius` at the given points into mask (h x w, row-major).
void stamp_disks(
    const int32_t* xs,
    const int32_t* ys,
    int64_t n,
    int32_t w,
    int32_t h,
    int32_t radius,
    uint8_t* mask) {
  const int64_t r2 = static_cast<int64_t>(radius) * radius;
  for (int64_t i = 0; i < n; ++i) {
    const int32_t x = xs[i];
    const int32_t y = ys[i];
    const int32_t mx0 = x - radius < 0 ? 0 : x - radius;
    const int32_t mx1 = x + radius >= w ? w - 1 : x + radius;
    const int32_t my0 = y - radius < 0 ? 0 : y - radius;
    const int32_t my1 = y + radius >= h ? h - 1 : y + radius;
    for (int32_t my = my0; my <= my1; ++my) {
      const int64_t dy = my - y;
      uint8_t* row = mask + static_cast<size_t>(my) * w;
      for (int32_t mx = mx0; mx <= mx1; ++mx) {
        const int64_t dx = mx - x;
        if (dx * dx + dy * dy <= r2) {
          row[mx] = 1;
        }
      }
    }
  }
}

}  // extern "C"
