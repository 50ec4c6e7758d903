// Native data-plane kernels for the input pipeline.
//
// The reference's input pipeline is pure Python inside DataLoader workers
// (data/vg_custom_mask.py:71-173: per-object box normalization, mask
// rasterization, shift augmentation, multi-hot attribute encoding). Here the
// per-batch assembly hot loop is C++, called via ctypes from
// aglayout_tpu/data/native.py; the Python/numpy implementation remains as a
// fallback with identical semantics (tested against each other).
//
// Build: make -C native      (produces native/libdatapath.so)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// round-half-to-even, matching Python round() / numpy rint semantics used
// by the reference's mask slicing (vg_custom_mask.py:136)
inline long rhe(double x) { return std::llrint(x); }

inline void rasterize_one(float* mask, int size, double x0, double y0,
                          double x1, double y1) {
  long r0 = rhe(y0 * size), r1 = rhe(y1 * size);
  long c0 = rhe(x0 * size), c1 = rhe(x1 * size);
  if (r0 < 0) r0 = 0;
  if (c0 < 0) c0 = 0;
  if (r1 > size) r1 = size;
  if (c1 > size) c1 = size;
  for (long r = r0; r < r1; ++r) {
    float* row = mask + r * size;
    for (long c = c0; c < c1; ++c) row[c] = 1.0f;
  }
}

inline void shift_box(double x0, double y0, double x1, double y1, double* out) {
  // horizontal shift augmentation (vg_custom_mask.py:139-158)
  double w = x1 - x0, dx = 0.0;
  if (w < 0.5) {
    double left = x0, right = 1.0 - x1;
    if (left > right)
      dx = -left * 0.8;
    else if (right > left)
      dx = right * 0.8;
  }
  out[0] = x0 + dx;
  out[1] = y0;
  out[2] = x1 + dx;
  out[3] = y1;
}

}  // namespace

extern "C" {

// Assemble the per-object tensors for a whole batch.
//
//  boxes_px   (n, 4) float64: pixel-space [x, y, w, h] (VG h5 layout)
//  img_w/h    (n,) float64: original image dims for normalization
//  att_ids    (n, max_atts) int32: attribute ids, -1 padded
//  valid      (n,) float32
// outputs (pre-zeroed by caller):
//  boxes      (n, 4) float32 normalized [x0, y0, x1, y1]
//  boxes_s    (n, 4) float32 shifted
//  masks      (n, size, size) float32
//  masks_s    (n, size, size) float32
//  attribute  (n, att_dim) float32 multi-hot
void assemble_objects(const double* boxes_px, const double* img_w,
                      const double* img_h, const int32_t* att_ids,
                      const float* valid, int n, int max_atts, int att_dim,
                      int size, int num_threads, float* boxes, float* boxes_s,
                      float* masks, float* masks_s, float* attribute) {
  auto work = [&](int t) {
    for (int i = t; i < n; i += num_threads) {
      if (valid[i] <= 0.0f) {
        // padded slot: identity box, zero mask (contract of the loader)
        boxes[i * 4 + 0] = 0.f;
        boxes[i * 4 + 1] = 0.f;
        boxes[i * 4 + 2] = 1.f;
        boxes[i * 4 + 3] = 1.f;
        std::memcpy(boxes_s + i * 4, boxes + i * 4, 4 * sizeof(float));
        continue;
      }
      double W = img_w[i], H = img_h[i];
      double x = boxes_px[i * 4 + 0], y = boxes_px[i * 4 + 1];
      double w = boxes_px[i * 4 + 2], h = boxes_px[i * 4 + 3];
      double x0 = x / W, y0 = y / H, x1 = (x + w) / W, y1 = (y + h) / H;
      boxes[i * 4 + 0] = (float)x0;
      boxes[i * 4 + 1] = (float)y0;
      boxes[i * 4 + 2] = (float)x1;
      boxes[i * 4 + 3] = (float)y1;
      rasterize_one(masks + (size_t)i * size * size, size, x0, y0, x1, y1);

      double sb[4];
      shift_box(x0, y0, x1, y1, sb);
      for (int k = 0; k < 4; ++k) boxes_s[i * 4 + k] = (float)sb[k];
      rasterize_one(masks_s + (size_t)i * size * size, size, sb[0], sb[1],
                    sb[2], sb[3]);

      const int32_t* ids = att_ids + (size_t)i * max_atts;
      float* att = attribute + (size_t)i * att_dim;
      for (int k = 0; k < max_atts && ids[k] >= 0; ++k) {
        if (ids[k] < att_dim) att[ids[k]] = 1.0f;
      }
    }
  };
  if (num_threads <= 1) {
    work(0);
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(work, t);
  for (auto& th : threads) th.join();
}

// uint8 HWC -> imagenet-normalized float HWC (the decode post-processing)
void normalize_images(const uint8_t* src, float* dst, int n, int hw) {
  const float mean[3] = {0.485f, 0.456f, 0.406f};
  const float istd[3] = {1.f / 0.229f, 1.f / 0.224f, 1.f / 0.225f};
  size_t total = (size_t)n * hw;
  for (size_t p = 0; p < total; ++p) {
    const uint8_t* s = src + p * 3;
    float* d = dst + p * 3;
    for (int c = 0; c < 3; ++c)
      d[c] = ((float)s[c] * (1.0f / 255.0f) - mean[c]) * istd[c];
  }
}
}
