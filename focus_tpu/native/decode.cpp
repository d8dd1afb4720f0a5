// Native batched JPEG decode -> resize -> normalize for the host input
// pipeline. TPU-native counterpart of the reference's PyAV/PIL decode
// workers (reference slowfast/datasets/utils.py retry_load_images &
// decoder.py): the per-frame Python/PIL path is replaced by a
// libjpeg + bilinear-resize + normalize loop parallelised with
// std::thread, writing straight into the caller's batch buffer (zero
// Python-object churn, one memcpy-free pass).
//
// Exposed via ctypes (no pybind11 in the image); see
// focus_tpu/native/__init__.py for the build-on-first-use wrapper.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
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

// Decode one JPEG file to RGB. Returns true on success. When
// min_w/min_h > 0, libjpeg DCT scaling (1/2, 1/4, 1/8) decodes at the
// smallest resolution whose dims still cover (min_w, min_h) — the IDCT
// then does most of the downsample for free (and with a proper
// area-average filter); the bilinear pass below only closes the
// remaining <2x gap. This changes the effective resample filter vs a
// full-resolution bilinear, so callers opt in per pipeline.
bool decode_file(const char* path, std::vector<uint8_t>& rgb, int& w, int& h,
                 int min_w = 0, int min_h = 0) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  if (min_w > 0 && min_h > 0) {
    int denom = 1;
    while (denom < 8 &&
           (cinfo.image_width + 2 * denom - 1) / (2 * denom) >= (unsigned)min_w &&
           (cinfo.image_height + 2 * denom - 1) / (2 * denom) >= (unsigned)min_h)
      denom *= 2;
    cinfo.scale_num = 1;
    cinfo.scale_denom = denom;
  }
  jpeg_start_decompress(&cinfo);
  w = cinfo.output_width;
  h = cinfo.output_height;
  rgb.resize(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = rgb.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Bilinear resize (align_corners=false, PIL-like half-pixel centres) +
// optional normalisation, writing float32 HWC.
void resize_normalize(const uint8_t* src, int sw, int sh, float* dst, int dw,
                      int dh, const float* mean, const float* inv_std,
                      float scale) {
  const float x_ratio = static_cast<float>(sw) / dw;
  const float y_ratio = static_cast<float>(sh) / dh;
  for (int y = 0; y < dh; ++y) {
    float sy = (y + 0.5f) * y_ratio - 0.5f;
    if (sy < 0) sy = 0;
    int y0 = static_cast<int>(sy);
    int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    float fy = sy - y0;
    for (int x = 0; x < dw; ++x) {
      float sx = (x + 0.5f) * x_ratio - 0.5f;
      if (sx < 0) sx = 0;
      int x0 = static_cast<int>(sx);
      int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
      float fx = sx - x0;
      const uint8_t* p00 = src + (static_cast<size_t>(y0) * sw + x0) * 3;
      const uint8_t* p01 = src + (static_cast<size_t>(y0) * sw + x1) * 3;
      const uint8_t* p10 = src + (static_cast<size_t>(y1) * sw + x0) * 3;
      const uint8_t* p11 = src + (static_cast<size_t>(y1) * sw + x1) * 3;
      float* out = dst + (static_cast<size_t>(y) * dw + x) * 3;
      for (int c = 0; c < 3; ++c) {
        float v0 = p00[c] + (p01[c] - p00[c]) * fx;
        float v1 = p10[c] + (p11[c] - p10[c]) * fx;
        float v = (v0 + (v1 - v0) * fy) * scale;
        out[c] = (v - mean[c]) * inv_std[c];
      }
    }
  }
}

// Bilinear resize straight to uint8 (round-to-nearest). Used by the
// device-preprocess pipeline: crop/flip/normalise happen on the TPU, so
// the host ships raw uint8 pixels (4x smaller H2D than float32).
void resize_u8(const uint8_t* src, int sw, int sh, uint8_t* dst, int dw,
               int dh) {
  const float x_ratio = static_cast<float>(sw) / dw;
  const float y_ratio = static_cast<float>(sh) / dh;
  for (int y = 0; y < dh; ++y) {
    float sy = (y + 0.5f) * y_ratio - 0.5f;
    if (sy < 0) sy = 0;
    int y0 = static_cast<int>(sy);
    int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    float fy = sy - y0;
    for (int x = 0; x < dw; ++x) {
      float sx = (x + 0.5f) * x_ratio - 0.5f;
      if (sx < 0) sx = 0;
      int x0 = static_cast<int>(sx);
      int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
      float fx = sx - x0;
      const uint8_t* p00 = src + (static_cast<size_t>(y0) * sw + x0) * 3;
      const uint8_t* p01 = src + (static_cast<size_t>(y0) * sw + x1) * 3;
      const uint8_t* p10 = src + (static_cast<size_t>(y1) * sw + x0) * 3;
      const uint8_t* p11 = src + (static_cast<size_t>(y1) * sw + x1) * 3;
      uint8_t* out = dst + (static_cast<size_t>(y) * dw + x) * 3;
      for (int c = 0; c < 3; ++c) {
        float v0 = p00[c] + (p01[c] - p00[c]) * fx;
        float v1 = p10[c] + (p11[c] - p10[c]) * fx;
        float v = v0 + (v1 - v0) * fy;
        int vi = static_cast<int>(v + 0.5f);
        out[c] = vi < 0 ? 0 : (vi > 255 ? 255 : static_cast<uint8_t>(vi));
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode n JPEGs into out [n, out_h, out_w, 3] float32 (normalised).
// scale: multiplier applied to [0,255] pixels before (x-mean)/std —
// pass 1/255 for [0,1]-range pipelines. Returns number of failures.
int decode_jpeg_batch(const char** paths, int n, int out_h, int out_w,
                      float* out, const float* mean, const float* std,
                      float scale, int num_threads) {
  std::atomic<int> failures{0};
  std::atomic<int> next{0};
  float inv_std[3] = {1.0f / std[0], 1.0f / std[1], 1.0f / std[2]};
  auto worker = [&]() {
    std::vector<uint8_t> rgb;
    int w, h;
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      float* dst = out + static_cast<size_t>(i) * out_h * out_w * 3;
      if (!decode_file(paths[i], rgb, w, h)) {
        failures.fetch_add(1);
        std::memset(dst, 0, static_cast<size_t>(out_h) * out_w * 3 * 4);
        continue;
      }
      resize_normalize(rgb.data(), w, h, dst, out_w, out_h, mean, inv_std,
                       scale);
    }
  };
  int t = num_threads > 0 ? num_threads : 1;
  if (t == 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    threads.reserve(t);
    for (int i = 0; i < t; ++i) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
  }
  return failures.load();
}

// Decode n JPEGs into out [n, out_h, out_w, 3] uint8 (no normalise —
// the device graph does crop/flip/normalise). dct_scale != 0 permits
// DCT-scaled decode (see decode_file). Returns number of failures.
int decode_jpeg_batch_u8(const char** paths, int n, int out_h, int out_w,
                         uint8_t* out, int num_threads, int dct_scale) {
  std::atomic<int> failures{0};
  std::atomic<int> next{0};
  auto worker = [&]() {
    std::vector<uint8_t> rgb;
    int w, h;
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      uint8_t* dst = out + static_cast<size_t>(i) * out_h * out_w * 3;
      bool ok = dct_scale
                    ? decode_file(paths[i], rgb, w, h, out_w, out_h)
                    : decode_file(paths[i], rgb, w, h);
      if (!ok) {
        failures.fetch_add(1);
        std::memset(dst, 0, static_cast<size_t>(out_h) * out_w * 3);
        continue;
      }
      resize_u8(rgb.data(), w, h, dst, out_w, out_h);
    }
  };
  int t = num_threads > 0 ? num_threads : 1;
  if (t == 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    threads.reserve(t);
    for (int i = 0; i < t; ++i) threads.emplace_back(worker);
    for (auto& th : threads) th.join();
  }
  return failures.load();
}

// Probe the dimensions of one JPEG (returns 0 on success).
int jpeg_dims(const char* path, int* w, int* h) {
  std::vector<uint8_t> rgb;  // unused; header-only read below
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

}  // extern "C"
