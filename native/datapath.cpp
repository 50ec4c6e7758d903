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

// ---------------------------------------------------------------------------
// JPEG decode worker pool (libjpeg) + PIL-compatible bilinear resize +
// imagenet normalize — the loader's per-image hot path
// (aglayout_tpu/data/dataset.py _load_image), replacing PIL-in-Python
// threads when libdatapath.so is built.
// ---------------------------------------------------------------------------

#include <csetjmp>
#include <cstdio>

#include <jpeglib.h>

namespace {

struct JErrMgr {
  jpeg_error_mgr pub;
  std::jmp_buf jb;
};

void jerr_exit(j_common_ptr cinfo) {
  std::longjmp(reinterpret_cast<JErrMgr*>(cinfo->err)->jb, 1);
}

// Decode a JPEG file to RGB; returns true on success.
//
// min_dim > 0 enables libjpeg DCT-domain scaled decode (scale 1/2, 1/4,
// 1/8): the largest power-of-2 reduction keeping both output dims >=
// min_dim. For VG-sized JPEGs (~500 px) resized to 64^2 this decodes
// ~16x fewer pixels AND skips most of the IDCT — the input pipeline's
// dominant CPU cost on a shared host core. The DCT box-downsample
// composed with the triangle resample below approximates the full-res
// triangle resample to within ~1-2/255 (tested, tests/test_native.py).
// ow/oh receive the ORIGINAL image dims (box normalization needs them);
// w/h the decoded (possibly scaled) dims.
bool decode_jpeg_file(const char* path, std::vector<uint8_t>& rgb, int* w,
                      int* h, int* ow, int* oh, int min_dim) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jerr_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  *ow = cinfo.image_width;
  *oh = cinfo.image_height;
  cinfo.out_color_space = JCS_RGB;
  if (min_dim > 0) {
    // largest reduction keeping the decoded image >= the target per axis.
    // Error vs the full-res resample is dominated by DCT-truncation
    // ringing at hard edges (measured ~equal at 1/2 and 1/4 scale, mean
    // well under 1/255), so take the full decode saving.
    int denom = 1;
    while (denom < 8 && (int)cinfo.image_width / (denom * 2) >= min_dim &&
           (int)cinfo.image_height / (denom * 2) >= min_dim)
      denom *= 2;
    cinfo.scale_num = 1;
    cinfo.scale_denom = (unsigned)denom;
  }
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  rgb.resize((size_t)(*w) * (*h) * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb.data() + (size_t)cinfo.output_scanline * (*w) * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

// PIL-compatible separable triangle (BILINEAR with antialias) resampling:
// per output pixel, center = (i+0.5)*scale, support = max(scale, 1);
// weights = triangle((j+0.5-center)/filterscale), normalized (float
// arithmetic; PIL quantizes to int16 — differences are sub-1/255).
struct ResampleAxis {
  std::vector<int> lo, n;
  std::vector<float> w;  // flattened (out, max_taps)
  int max_taps = 0;
};

ResampleAxis plan_axis(int in, int out) {
  ResampleAxis ax;
  double scale = (double)in / out;
  double fscale = scale < 1.0 ? 1.0 : scale;
  double support = 1.0 * fscale;  // triangle filter support = 1
  ax.max_taps = (int)std::ceil(support) * 2 + 1;
  ax.lo.resize(out);
  ax.n.resize(out);
  ax.w.assign((size_t)out * ax.max_taps, 0.0f);
  for (int i = 0; i < out; ++i) {
    double center = (i + 0.5) * scale;
    int lo = (int)(center - support + 0.5);
    int hi = (int)(center + support + 0.5);
    if (lo < 0) lo = 0;
    if (hi > in) hi = in;
    double sum = 0.0;
    std::vector<double> wd(hi - lo);
    for (int j = lo; j < hi; ++j) {
      double x = (j - center + 0.5) / fscale;
      double v = x < 0 ? 1.0 + x : 1.0 - x;
      wd[j - lo] = v > 0 ? v : 0.0;
      sum += wd[j - lo];
    }
    ax.lo[i] = lo;
    ax.n[i] = hi - lo;
    for (int j = 0; j < hi - lo; ++j)
      ax.w[(size_t)i * ax.max_taps + j] = (float)(wd[j] / sum);
  }
  return ax;
}

// resize RGB (h, w) -> (size, size) + imagenet normalize into out (S,S,3)
void resize_normalize(const uint8_t* rgb, int w, int h, int size, float* out) {
  ResampleAxis axw = plan_axis(w, size), axh = plan_axis(h, size);
  // horizontal pass: (h, w, 3) -> (h, size, 3)
  std::vector<float> tmp((size_t)h * size * 3);
  for (int r = 0; r < h; ++r) {
    const uint8_t* src = rgb + (size_t)r * w * 3;
    float* dst = tmp.data() + (size_t)r * size * 3;
    for (int i = 0; i < size; ++i) {
      float acc[3] = {0, 0, 0};
      const float* ww = &axw.w[(size_t)i * axw.max_taps];
      for (int j = 0; j < axw.n[i]; ++j) {
        const uint8_t* p = src + (size_t)(axw.lo[i] + j) * 3;
        for (int c = 0; c < 3; ++c) acc[c] += ww[j] * p[c];
      }
      for (int c = 0; c < 3; ++c) dst[i * 3 + c] = acc[c];
    }
  }
  const float mean[3] = {0.485f, 0.456f, 0.406f};
  const float istd[3] = {1.f / 0.229f, 1.f / 0.224f, 1.f / 0.225f};
  // vertical pass + normalize: (h, size, 3) -> (size, size, 3)
  for (int i = 0; i < size; ++i) {
    const float* ww = &axh.w[(size_t)i * axh.max_taps];
    float* dst = out + (size_t)i * size * 3;
    for (int x = 0; x < size; ++x) {
      float acc[3] = {0, 0, 0};
      for (int j = 0; j < axh.n[i]; ++j) {
        const float* p =
            tmp.data() + ((size_t)(axh.lo[i] + j) * size + x) * 3;
        for (int c = 0; c < 3; ++c) acc[c] += ww[j] * p[c];
      }
      for (int c = 0; c < 3; ++c) {
        float v = acc[c] * (1.0f / 255.0f);
        v = v < 0.f ? 0.f : (v > 1.f ? 1.f : v);
        dst[x * 3 + c] = (v - mean[c]) * istd[c];
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode + resize + normalize a batch of JPEG files with a thread pool.
// paths: n C strings; out: (n, size, size, 3) float32; dims: (n, 2) int32
// (original W, H). fast_scale != 0 enables DCT-domain scaled decode
// (output stays >= size per axis; ~1-2/255 delta vs full-res resample).
// Returns the number of files that FAILED to decode (failed slots are left
// zeroed with dims 0 — callers fall back per file).
int decode_batch(const char** paths, int n, int size, int num_threads,
                 float* out, int32_t* dims, int fast_scale) {
  std::vector<int> fail(n, 0);
  auto work = [&](int t) {
    std::vector<uint8_t> rgb;
    for (int i = t; i < n; i += num_threads) {
      int w = 0, h = 0, ow = 0, oh = 0;
      if (decode_jpeg_file(paths[i], rgb, &w, &h, &ow, &oh,
                           fast_scale ? size : 0)) {
        resize_normalize(rgb.data(), w, h, size,
                         out + (size_t)i * size * size * 3);
        dims[i * 2] = ow;
        dims[i * 2 + 1] = oh;
      } else {
        dims[i * 2] = 0;
        dims[i * 2 + 1] = 0;
        fail[i] = 1;
      }
    }
  };
  if (num_threads <= 1) {
    work(0);
  } else {
    std::vector<std::thread> threads;
    for (int t = 0; t < num_threads; ++t) threads.emplace_back(work, t);
    for (auto& th : threads) th.join();
  }
  int nf = 0;
  for (int i = 0; i < n; ++i) nf += fail[i];
  return nf;
}
}
