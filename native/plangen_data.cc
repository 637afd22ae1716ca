// Native data-path kernels for plangen_tpu (C ABI, loaded via ctypes).
//
// The reference's data pipeline leans on torchvision/PIL/cv2 native code for
// image preprocessing (SURVEY.md Table B); this library is the TPU build's
// equivalent host-side native component: multithreaded bilinear resize,
// [-1,1] normalization, and uint8->float conversion fused in one pass, used
// by the training data loader when present (python falls back to PIL
// otherwise).
//
// Build: make -C native   (produces libplangen_data.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline float lerp(float a, float b, float t) { return a + (b - a) * t; }

// Bilinear sample with half-pixel centers (align_corners=false, the
// torch/cv2 convention). src is HWC uint8.
inline void sample_row(const uint8_t* src, int sh, int sw, int channels,
                       int dw, float scale_x, float sy, float* out_row,
                       bool normalize) {
  const int y0 = std::max(0, std::min(sh - 1, (int)std::floor(sy)));
  const int y1 = std::min(sh - 1, y0 + 1);
  const float ty = sy - (float)y0;
  const uint8_t* r0 = src + (size_t)y0 * sw * channels;
  const uint8_t* r1 = src + (size_t)y1 * sw * channels;
  for (int x = 0; x < dw; ++x) {
    const float sx = ((float)x + 0.5f) * scale_x - 0.5f;
    const int x0 = std::max(0, std::min(sw - 1, (int)std::floor(sx)));
    const int x1 = std::min(sw - 1, x0 + 1);
    const float tx = sx - (float)x0;
    for (int c = 0; c < channels; ++c) {
      const float top = lerp((float)r0[x0 * channels + c],
                             (float)r0[x1 * channels + c], tx < 0 ? 0 : tx);
      const float bot = lerp((float)r1[x0 * channels + c],
                             (float)r1[x1 * channels + c], tx < 0 ? 0 : tx);
      float v = lerp(top, bot, ty < 0 ? 0 : ty);
      if (normalize) v = v * (2.0f / 255.0f) - 1.0f;  // [-1, 1]
      out_row[x * channels + c] = v;
    }
  }
}

void resize_one(const uint8_t* src, int sh, int sw, int channels, float* dst,
                int dh, int dw, bool normalize, int thread_count) {
  const float scale_y = (float)sh / (float)dh;
  const float scale_x = (float)sw / (float)dw;
  if (thread_count <= 1 || dh < 64) {
    for (int y = 0; y < dh; ++y) {
      const float sy = ((float)y + 0.5f) * scale_y - 0.5f;
      sample_row(src, sh, sw, channels, dw, scale_x, sy,
                 dst + (size_t)y * dw * channels, normalize);
    }
    return;
  }
  std::atomic<int> next_row{0};
  auto worker = [&]() {
    int y;
    while ((y = next_row.fetch_add(1)) < dh) {
      const float sy = ((float)y + 0.5f) * scale_y - 0.5f;
      sample_row(src, sh, sw, channels, dw, scale_x, sy,
                 dst + (size_t)y * dw * channels, normalize);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < thread_count; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Resize a single HWC uint8 image to (dh, dw) float32, optionally mapping to
// [-1, 1]. Returns 0 on success.
int plangen_resize_bilinear(const uint8_t* src, int sh, int sw, int channels,
                            float* dst, int dh, int dw, int normalize,
                            int threads) {
  if (!src || !dst || sh <= 0 || sw <= 0 || dh <= 0 || dw <= 0) return 1;
  resize_one(src, sh, sw, channels, dst, dh, dw, normalize != 0, threads);
  return 0;
}

// Batch variant: n images, same source size, contiguous src/dst.
int plangen_resize_bilinear_batch(const uint8_t* src, int n, int sh, int sw,
                                  int channels, float* dst, int dh, int dw,
                                  int normalize, int threads) {
  if (!src || !dst || n <= 0) return 1;
  std::atomic<int> next{0};
  auto worker = [&]() {
    int i;
    while ((i = next.fetch_add(1)) < n) {
      resize_one(src + (size_t)i * sh * sw * channels, sh, sw, channels,
                 dst + (size_t)i * dh * dw * channels, dh, dw, normalize != 0,
                 1);
    }
  };
  int tc = std::max(1, std::min(n, threads));
  std::vector<std::thread> threads_v;
  for (int t = 0; t < tc; ++t) threads_v.emplace_back(worker);
  for (auto& th : threads_v) th.join();
  return 0;
}

}  // extern "C"
