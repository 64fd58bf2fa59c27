// jcfnative — native host-side image pipeline for the TPU serving path.
//
// The reference delegates all image IO to PIL inside 8 dataloader worker
// processes (ood.py:1094). At the throughput this framework targets
// (~1000+ images/sec/chip), Python-side JPEG decode becomes the host
// bottleneck; this library provides:
//
//   * libjpeg decode with DCT prescaling (decodes at 1/2, 1/4, 1/8 scale
//     inside the codec — most of the resize is free)
//   * separable triangle-filter (antialiased bilinear) resize, the same
//     math as the device-side interpolation-matrix resampler
//   * short-side resize + center crop to a fixed square, matching
//     jcf_tpu.data.transforms.preprocess_center's geometry
//   * a std::thread batch API saturating all cores
//
// Exposed as a tiny C ABI consumed via ctypes (no pybind11 dependency).
//
// Build: g++ -O3 -march=native -shared -fPIC jcfnative.cpp -o _jcfnative.so -ljpeg -lpthread

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* mgr = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(mgr->jump, 1);
}

// Decode a JPEG file to RGB8. Uses libjpeg scale_denom prescaling so the
// decoded size is the smallest DCT scale still >= 2x the target short side
// (keeps the downstream filter well-sampled). Returns false on failure.
bool decode_jpeg(const char* path, int target_short, std::vector<uint8_t>& rgb,
                 int* out_w, int* out_h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  ErrorMgr err;
  cinfo.err = jpeg_std_error(&err.pub);
  err.pub.error_exit = error_exit;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);

  // pick the largest denominator whose output short side stays >= target
  int short_side = std::min((int)cinfo.image_width, (int)cinfo.image_height);
  int denom = 1;
  if (target_short > 0) {
    for (int d : {8, 4, 2}) {
      if (short_side / d >= target_short) { denom = d; break; }
    }
  }
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;
  cinfo.out_color_space = JCS_RGB;

  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  rgb.resize((size_t)w * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb.data() + (size_t)cinfo.output_scanline * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  *out_w = w;
  *out_h = h;
  return true;
}

// Separable antialiased triangle-filter resample of an interleaved RGB8
// image (same kernel as the device interp-matrix path).
void resize_rgb(const uint8_t* src, int sw, int sh, uint8_t* dst, int dw, int dh) {
  const float sx = (float)sw / dw;
  const float sy = (float)sh / dh;
  const float support_x = std::max(sx, 1.0f);
  const float support_y = std::max(sy, 1.0f);

  // horizontal pass into a float intermediate [sh, dw, 3]
  std::vector<float> tmp((size_t)sh * dw * 3);
  std::vector<int> x0(dw), x1(dw);
  std::vector<std::vector<float>> xw(dw);
  for (int ox = 0; ox < dw; ++ox) {
    const float center = (ox + 0.5f) * sx - 0.5f;
    int lo = (int)std::floor(center - support_x);
    int hi = (int)std::ceil(center + support_x);
    lo = std::max(lo, 0);
    hi = std::min(hi, sw - 1);
    x0[ox] = lo;
    x1[ox] = hi;
    auto& wv = xw[ox];
    wv.resize(hi - lo + 1);
    float sum = 0.0f;
    for (int i = lo; i <= hi; ++i) {
      float d = std::abs(i - center) / support_x;
      float w = std::max(0.0f, 1.0f - d);
      wv[i - lo] = w;
      sum += w;
    }
    const float inv = sum > 0 ? 1.0f / sum : 0.0f;
    for (auto& w : wv) w *= inv;
  }
  for (int y = 0; y < sh; ++y) {
    const uint8_t* srow = src + (size_t)y * sw * 3;
    float* trow = tmp.data() + (size_t)y * dw * 3;
    for (int ox = 0; ox < dw; ++ox) {
      float r = 0, g = 0, b = 0;
      const auto& wv = xw[ox];
      for (int i = x0[ox]; i <= x1[ox]; ++i) {
        const float w = wv[i - x0[ox]];
        const uint8_t* p = srow + i * 3;
        r += w * p[0];
        g += w * p[1];
        b += w * p[2];
      }
      trow[ox * 3 + 0] = r;
      trow[ox * 3 + 1] = g;
      trow[ox * 3 + 2] = b;
    }
  }

  // vertical pass
  for (int oy = 0; oy < dh; ++oy) {
    const float center = (oy + 0.5f) * sy - 0.5f;
    int lo = (int)std::floor(center - support_y);
    int hi = (int)std::ceil(center + support_y);
    lo = std::max(lo, 0);
    hi = std::min(hi, sh - 1);
    float sum = 0.0f;
    std::vector<float> wv(hi - lo + 1);
    for (int i = lo; i <= hi; ++i) {
      float d = std::abs(i - center) / support_y;
      float w = std::max(0.0f, 1.0f - d);
      wv[i - lo] = w;
      sum += w;
    }
    const float inv = sum > 0 ? 1.0f / sum : 0.0f;
    uint8_t* drow = dst + (size_t)oy * dw * 3;
    for (int ox = 0; ox < dw * 3; ++ox) {
      float acc = 0.0f;
      for (int i = lo; i <= hi; ++i) {
        acc += wv[i - lo] * inv * tmp[(size_t)i * dw * 3 + ox];
      }
      drow[ox] = (uint8_t)std::min(std::max(acc + 0.5f, 0.0f), 255.0f);
    }
  }
}

// decode -> short-side resize to `resize_to` -> center crop `out_size`.
// Writes out_size*out_size*3 RGB8 into `out`. Returns 0 on success.
int process_one(const char* path, int resize_to, int out_size, uint8_t* out) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (!decode_jpeg(path, resize_to, rgb, &w, &h)) return 1;

  int rw, rh;
  if (w <= h) {
    rw = resize_to;
    rh = (int)((int64_t)resize_to * h / w);
  } else {
    rh = resize_to;
    rw = (int)((int64_t)resize_to * w / h);
  }
  std::vector<uint8_t> resized((size_t)rw * rh * 3);
  resize_rgb(rgb.data(), w, h, resized.data(), rw, rh);

  const int left = (rw - out_size) / 2;
  const int top = (rh - out_size) / 2;
  for (int y = 0; y < out_size; ++y) {
    std::memcpy(out + (size_t)y * out_size * 3,
                resized.data() + ((size_t)(top + y) * rw + left) * 3,
                (size_t)out_size * 3);
  }
  return 0;
}

}  // namespace

extern "C" {

// Batch decode+resize+crop with a thread pool.
//   paths:    array of n C strings
//   out:      n * out_size * out_size * 3 bytes (RGB8, HWC per image)
//   statuses: n ints, 0 = ok
int jcf_decode_batch(const char** paths, int n, int resize_to, int out_size,
                     uint8_t* out, int* statuses, int n_threads) {
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  n_threads = std::max(1, std::min(n_threads, n));
  std::atomic<int> next(0);
  const size_t stride = (size_t)out_size * out_size * 3;

  auto worker = [&]() {
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      statuses[i] = process_one(paths[i], resize_to, out_size, out + stride * i);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();

  int failures = 0;
  for (int i = 0; i < n; ++i) failures += statuses[i] != 0;
  return failures;
}

int jcf_decode_one(const char* path, int resize_to, int out_size, uint8_t* out) {
  return process_one(path, resize_to, out_size, out);
}

}  // extern "C"
