// virtex_tpu native data-plane: fused JPEG decode + crop + resize (area
// when shrinking / bilinear when growing, cv2's rule) + flip + ImageNet
// normalization, C ABI for ctypes.
//
// Role: the reference's host-side hot path is cv2 decode + albumentations
// per item on CPU workers (SURVEY §3.1 hot loops); at TPU throughput targets
// the Python/opencv hop per image becomes the bottleneck (SURVEY §7 risks:
// "input pipeline throughput"). This library collapses decode→augment→
// normalize into one pass over the pixels with no intermediate Python
// objects; random augmentation *parameters* (crop rect, flip bit) are drawn
// in Python (numpy RandomState) to keep determinism and tests host-side.
//
// Build: see build.py (g++ -O3 -march=native -shared -fPIC -ljpeg -fopenmp).
//
// Layout: outputs are HWC float32 (NHWC batches), matching the TPU-native
// layout used across the framework.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG buffer to RGB8. Returns true on success; fills (h, w) and
// writes into `out`, which is resized by the caller contract below.
bool decode_rgb(const uint8_t* buf, size_t len, std::vector<uint8_t>* out,
                int* h, int* w) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  out->resize(size_t(*w) * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + size_t(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Bilinear sample from an RGB8 crop region into a float32 HWC target,
// fusing flip + (x - mean) / std.
void resize_normalize(const uint8_t* src, int src_h, int src_w,
                      int cy, int cx, int ch, int cw, int out_size, bool flip,
                      const float* mean, const float* inv_std, float* dst) {
  const float sy = float(ch) / out_size;
  const float sx = float(cw) / out_size;
  for (int oy = 0; oy < out_size; ++oy) {
    // align_corners=False convention (cv2/albumentations resize)
    float fy = (oy + 0.5f) * sy - 0.5f;
    fy = std::min(std::max(fy, 0.0f), float(ch - 1));
    int y0 = int(fy);
    int y1 = std::min(y0 + 1, ch - 1);
    float wy = fy - y0;
    for (int ox = 0; ox < out_size; ++ox) {
      float fx = (ox + 0.5f) * sx - 0.5f;
      fx = std::min(std::max(fx, 0.0f), float(cw - 1));
      int x0 = int(fx);
      int x1 = std::min(x0 + 1, cw - 1);
      float wx = fx - x0;
      const int out_x = flip ? (out_size - 1 - ox) : ox;
      float* px = dst + (size_t(oy) * out_size + out_x) * 3;
      for (int c = 0; c < 3; ++c) {
        const uint8_t* p00 =
            src + ((size_t(cy + y0) * src_w) + (cx + x0)) * 3 + c;
        const uint8_t* p01 =
            src + ((size_t(cy + y0) * src_w) + (cx + x1)) * 3 + c;
        const uint8_t* p10 =
            src + ((size_t(cy + y1) * src_w) + (cx + x0)) * 3 + c;
        const uint8_t* p11 =
            src + ((size_t(cy + y1) * src_w) + (cx + x1)) * 3 + c;
        float top = *p00 + wx * (*p01 - *p00);
        float bot = *p10 + wx * (*p11 - *p10);
        float val = (top + wy * (bot - top)) * (1.0f / 255.0f);
        px[c] = (val - mean[c]) * inv_std[c];
      }
    }
  }
}

// Area-averaged downscale (cv2 INTER_AREA semantics): each output pixel is
// the mean of its source footprint [oy·sy, (oy+1)·sy) × [ox·sx, (ox+1)·sx)
// with fractional edge weights. The behavioral-reference cv2 path selects
// INTER_AREA whenever either axis shrinks (data/transforms.py `_resize`);
// this keeps the shipped native pixels aligned with it (golden-tested in
// tests/test_native.py).
void resize_area_normalize(const uint8_t* src, int src_h, int src_w,
                           int cy, int cx, int ch, int cw, int out_size,
                           bool flip, const float* mean, const float* inv_std,
                           float* dst) {
  const float sy = float(ch) / out_size;
  const float sx = float(cw) / out_size;
  const float inv_area = 1.0f / (sy * sx);
  for (int oy = 0; oy < out_size; ++oy) {
    const float fy0 = oy * sy;
    const float fy1 = fy0 + sy;
    const int iy0 = int(fy0);
    const int iy1 = std::min(int(std::ceil(fy1)), ch);
    for (int ox = 0; ox < out_size; ++ox) {
      const float fx0 = ox * sx;
      const float fx1 = fx0 + sx;
      const int ix0 = int(fx0);
      const int ix1 = std::min(int(std::ceil(fx1)), cw);
      float acc[3] = {0.f, 0.f, 0.f};
      for (int y = iy0; y < iy1; ++y) {
        const float wy =
            std::min(fy1, float(y + 1)) - std::max(fy0, float(y));
        const uint8_t* row = src + (size_t(cy + y) * src_w + cx) * 3;
        for (int x = ix0; x < ix1; ++x) {
          const float w =
              wy * (std::min(fx1, float(x + 1)) - std::max(fx0, float(x)));
          const uint8_t* p = row + size_t(x) * 3;
          acc[0] += w * p[0];
          acc[1] += w * p[1];
          acc[2] += w * p[2];
        }
      }
      const int out_x = flip ? (out_size - 1 - ox) : ox;
      float* px = dst + (size_t(oy) * out_size + out_x) * 3;
      for (int c = 0; c < 3; ++c) {
        const float v = acc[c] * inv_area * (1.0f / 255.0f);
        px[c] = (v - mean[c]) * inv_std[c];
      }
    }
  }
}

// cv2-rule dispatch: area when either crop axis shrinks, else bilinear.
void resize_dispatch_normalize(const uint8_t* src, int src_h, int src_w,
                               int cy, int cx, int ch, int cw, int out_size,
                               bool flip, const float* mean,
                               const float* inv_std, float* dst) {
  if (ch > out_size || cw > out_size) {
    resize_area_normalize(src, src_h, src_w, cy, cx, ch, cw, out_size, flip,
                          mean, inv_std, dst);
  } else {
    resize_normalize(src, src_h, src_w, cy, cx, ch, cw, out_size, flip,
                     mean, inv_std, dst);
  }
}

// --- color jitter (on the resized crop, [0,255] float HWC) -----------------

void rgb_to_hsv(float r, float g, float b, float* h, float* s, float* v) {
  float mx = std::max(r, std::max(g, b));
  float mn = std::min(r, std::min(g, b));
  float d = mx - mn;
  *v = mx;
  *s = mx <= 0.f ? 0.f : d / mx;
  if (d <= 0.f) { *h = 0.f; return; }
  float hh;
  if (mx == r)      hh = (g - b) / d + (g < b ? 6.f : 0.f);
  else if (mx == g) hh = (b - r) / d + 2.f;
  else              hh = (r - g) / d + 4.f;
  *h = hh / 6.f;  // [0, 1)
}

void hsv_to_rgb(float h, float s, float v, float* r, float* g, float* b) {
  h = h - std::floor(h);
  float hh = h * 6.f;
  int i = int(hh) % 6;
  float f = hh - std::floor(hh);
  float p = v * (1.f - s), q = v * (1.f - s * f), t = v * (1.f - s * (1.f - f));
  switch (i) {
    case 0: *r = v; *g = t; *b = p; break;
    case 1: *r = q; *g = v; *b = p; break;
    case 2: *r = p; *g = v; *b = t; break;
    case 3: *r = p; *g = q; *b = v; break;
    case 4: *r = t; *g = p; *b = v; break;
    default: *r = v; *g = p; *b = q; break;
  }
}

// jitter params layout (9 floats): [enabled, op0, op1, op2, op3,
// brightness_f, contrast_f, saturation_f, hue_shift]. Ops: 0=brightness,
// 1=contrast, 2=saturation, 3=hue; applied in the given order on [0,255]
// floats, matching the numpy ColorJitter reference semantics.
void apply_jitter(float* img, int n_px, const float* jp) {
  if (jp == nullptr || jp[0] == 0.f) return;
  for (int k = 1; k <= 4; ++k) {
    int op = int(jp[k]);
    if (op == 0 && jp[5] != 1.f) {
      float f = jp[5];
      for (int i = 0; i < n_px * 3; ++i) img[i] *= f;
    } else if (op == 1 && jp[6] != 1.f) {
      // contrast blends toward the GRAYSCALE-image mean (Rec.601), the
      // torchvision/albumentations rule (and the numpy path's).
      double sum = 0.0;
      for (int i = 0; i < n_px; ++i) {
        const float* px = img + i * 3;
        sum += 0.299 * px[0] + 0.587 * px[1] + 0.114 * px[2];
      }
      float mean = float(sum / n_px);
      float f = jp[6];
      for (int i = 0; i < n_px * 3; ++i)
        img[i] = (img[i] - mean) * f + mean;
    } else if (op == 2 && jp[7] != 1.f) {
      float f = jp[7];
      for (int i = 0; i < n_px; ++i) {
        float* px = img + i * 3;
        float gray = 0.299f * px[0] + 0.587f * px[1] + 0.114f * px[2];
        px[0] = (px[0] - gray) * f + gray;
        px[1] = (px[1] - gray) * f + gray;
        px[2] = (px[2] - gray) * f + gray;
      }
    } else if (op == 3 && jp[8] != 0.f) {
      float shift = jp[8];
      for (int i = 0; i < n_px; ++i) {
        float* px = img + i * 3;
        float r = std::min(std::max(px[0], 0.f), 255.f) / 255.f;
        float g = std::min(std::max(px[1], 0.f), 255.f) / 255.f;
        float b = std::min(std::max(px[2], 0.f), 255.f) / 255.f;
        float h, s, v;
        rgb_to_hsv(r, g, b, &h, &s, &v);
        hsv_to_rgb(h + shift, s, v, &r, &g, &b);
        px[0] = r * 255.f; px[1] = g * 255.f; px[2] = b * 255.f;
      }
    }
  }
}

}  // namespace

extern "C" {

// Probe the dimensions of a JPEG without full decode.
// Returns 0 on success.
int vtx_jpeg_dims(const uint8_t* buf, size_t len, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, len);
  jpeg_read_header(&cinfo, TRUE);
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Fused: decode + crop(cy,cx,ch,cw) + bilinear resize to (out_size,
// out_size) + optional horizontal flip + optional color jitter + normalize.
// dst must hold out_size*out_size*3 float32. Negative crop params mean
// "full image"; `jitter` may be null (see apply_jitter for the layout).
// Returns 0 on success.
int vtx_decode_crop_resize_jitter_normalize(
    const uint8_t* buf, size_t len, int cy, int cx, int ch, int cw,
    int out_size, int flip, const float* jitter, const float* mean,
    const float* std, float* dst) {
  std::vector<uint8_t> rgb;
  int h = 0, w = 0;
  if (!decode_rgb(buf, len, &rgb, &h, &w)) return 1;
  if (ch <= 0 || cw <= 0) {
    cy = 0; cx = 0; ch = h; cw = w;
  }
  if (cy < 0 || cx < 0 || cy + ch > h || cx + cw > w) return 2;
  const bool jit = jitter != nullptr && jitter[0] != 0.f;
  if (!jit) {
    float inv_std[3] = {1.0f / std[0], 1.0f / std[1], 1.0f / std[2]};
    resize_dispatch_normalize(rgb.data(), h, w, cy, cx, ch, cw, out_size,
                              flip != 0, mean, inv_std, dst);
    return 0;
  }
  // jitter path: sample to [0,255] floats, jitter, then normalize in place.
  float raw_mean[3] = {0.f, 0.f, 0.f};
  float raw_inv_std[3] = {255.f, 255.f, 255.f};  // (x/255 - 0) * 255 = x
  resize_dispatch_normalize(rgb.data(), h, w, cy, cx, ch, cw, out_size,
                            flip != 0, raw_mean, raw_inv_std, dst);
  const int n_px = out_size * out_size;
  apply_jitter(dst, n_px, jitter);
  for (int i = 0; i < n_px; ++i) {
    float* px = dst + i * 3;
    for (int c = 0; c < 3; ++c) {
      float v = std::min(std::max(px[c], 0.f), 255.f) / 255.f;
      px[c] = (v - mean[c]) / std[c];
    }
  }
  return 0;
}

// Back-compat alias without jitter.
int vtx_decode_crop_resize_normalize(
    const uint8_t* buf, size_t len, int cy, int cx, int ch, int cw,
    int out_size, int flip, const float* mean, const float* std,
    float* dst) {
  return vtx_decode_crop_resize_jitter_normalize(
      buf, len, cy, cx, ch, cw, out_size, flip, nullptr, mean, std, dst);
}

// Batch variant: N images, per-image crop rects/flips, OpenMP-parallel.
// bufs: array of N pointers; lens: N lengths; rects: N*4 ints (cy,cx,ch,cw);
// flips: N ints; dst: N*out_size*out_size*3 floats.
// Returns number of failed images (0 = all good); failed slots are zeroed.
int vtx_batch_decode_transform(
    const uint8_t** bufs, const size_t* lens, const int* rects,
    const int* flips, int n, int out_size, const float* mean,
    const float* std, float* dst) {
  int failures = 0;
#pragma omp parallel for schedule(dynamic) reduction(+ : failures)
  for (int i = 0; i < n; ++i) {
    float* out = dst + size_t(i) * out_size * out_size * 3;
    int rc = vtx_decode_crop_resize_normalize(
        bufs[i], lens[i], rects[i * 4], rects[i * 4 + 1], rects[i * 4 + 2],
        rects[i * 4 + 3], out_size, flips[i], mean, std, out);
    if (rc != 0) {
      std::memset(out, 0, sizeof(float) * out_size * out_size * 3);
      ++failures;
    }
  }
  return failures;
}

// Batch variant with per-image jitter params (n*9 floats, or null).
int vtx_batch_decode_transform_jitter(
    const uint8_t** bufs, const size_t* lens, const int* rects,
    const int* flips, const float* jitters, int n, int out_size,
    const float* mean, const float* std, float* dst) {
  int failures = 0;
#pragma omp parallel for schedule(dynamic) reduction(+ : failures)
  for (int i = 0; i < n; ++i) {
    float* out = dst + size_t(i) * out_size * out_size * 3;
    const float* jp = jitters ? jitters + i * 9 : nullptr;
    int rc = vtx_decode_crop_resize_jitter_normalize(
        bufs[i], lens[i], rects[i * 4], rects[i * 4 + 1], rects[i * 4 + 2],
        rects[i * 4 + 3], out_size, flips[i], jp, mean, std, out);
    if (rc != 0) {
      std::memset(out, 0, sizeof(float) * out_size * out_size * 3);
      ++failures;
    }
  }
  return failures;
}

}  // extern "C"
