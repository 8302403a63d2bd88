// virtex_tpu native data-plane: fused JPEG decode + crop + bilinear resize +
// flip + ImageNet normalization, C ABI for ctypes.
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
// out_size) + optional horizontal flip + normalize. dst must hold
// out_size*out_size*3 float32. Negative crop params mean "full image".
// Returns 0 on success.
int vtx_decode_crop_resize_normalize(
    const uint8_t* buf, size_t len, int cy, int cx, int ch, int cw,
    int out_size, int flip, const float* mean, const float* std,
    float* dst) {
  std::vector<uint8_t> rgb;
  int h = 0, w = 0;
  if (!decode_rgb(buf, len, &rgb, &h, &w)) return 1;
  if (ch <= 0 || cw <= 0) {
    cy = 0; cx = 0; ch = h; cw = w;
  }
  if (cy < 0 || cx < 0 || cy + ch > h || cx + cw > w) return 2;
  float inv_std[3] = {1.0f / std[0], 1.0f / std[1], 1.0f / std[2]};
  resize_normalize(rgb.data(), h, w, cy, cx, ch, cw, out_size, flip != 0,
                   mean, inv_std, dst);
  return 0;
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

}  // extern "C"
