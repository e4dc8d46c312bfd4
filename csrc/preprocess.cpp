// Host-side frame preprocessing kernels for the data loader.
//
// The reference's input pipeline leans on native code via decord (C++ video
// decode) and torchvision's C++ transform kernels (SURVEY.md §2.4).  This
// library provides the TPU-host equivalents of the cycles-heavy inner
// loops: uint8 -> float conversion, aspect-preserving bilinear resize,
// center crop, [-1,1] / CLIP normalization — multi-threaded across frames.
// Exposed as a C ABI consumed through ctypes (i2v_adapter_tpu/data/native.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

// Bilinear sample from a HxWxC uint8 image at (y, x), channel c.
inline float sample_bilinear(const uint8_t* src, int h, int w, int c,
                             float y, float x, int ch) {
  int y0 = static_cast<int>(y);
  int x0 = static_cast<int>(x);
  int y1 = std::min(y0 + 1, h - 1);
  int x1 = std::min(x0 + 1, w - 1);
  float fy = y - y0;
  float fx = x - x0;
  const float v00 = src[(y0 * w + x0) * c + ch];
  const float v01 = src[(y0 * w + x1) * c + ch];
  const float v10 = src[(y1 * w + x0) * c + ch];
  const float v11 = src[(y1 * w + x1) * c + ch];
  return v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx +
         v10 * fy * (1 - fx) + v11 * fy * fx;
}

// Resize so the short side covers (target_h, target_w), center crop, and
// write float output scaled by `scale` and shifted by `shift` (per channel
// mean/std optional).
void process_one_frame(const uint8_t* src, int h, int w, int c, float* dst,
                       int th, int tw, const float* mean, const float* stdv,
                       bool to_pm1) {
  const float scale = std::max(static_cast<float>(th) / h,
                               static_cast<float>(tw) / w);
  const int rh = static_cast<int>(std::lround(h * scale));
  const int rw = static_cast<int>(std::lround(w * scale));
  const int top = (rh - th) / 2;
  const int left = (rw - tw) / 2;
  // per-axis source-per-dest factors from the ROUNDED resize dims — this is
  // what cv2.resize does; using the unrounded scale shifts sampling
  // coordinates at non-square aspect ratios.
  const float fy = static_cast<float>(h) / rh;
  const float fx = static_cast<float>(w) / rw;
  for (int y = 0; y < th; ++y) {
    // map output pixel back to source coordinates (align-corners=false)
    const float sy =
        std::min(std::max(((y + top) + 0.5f) * fy - 0.5f, 0.0f),
                 static_cast<float>(h - 1));
    for (int x = 0; x < tw; ++x) {
      const float sx =
          std::min(std::max(((x + left) + 0.5f) * fx - 0.5f, 0.0f),
                   static_cast<float>(w - 1));
      for (int ch = 0; ch < c; ++ch) {
        float v = sample_bilinear(src, h, w, c, sy, sx, ch) / 255.0f;
        if (to_pm1) {
          v = v * 2.0f - 1.0f;
        } else if (mean != nullptr) {
          v = (v - mean[ch]) / stdv[ch];
        }
        dst[(y * tw + x) * c + ch] = v;
      }
    }
  }
}

void parallel_for(int n, int num_threads, const std::function<void(int)>& fn) {
  if (num_threads <= 1 || n <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::vector<std::thread> threads;
  std::atomic<int> next{0};
  const int workers = std::min(num_threads, n);
  threads.reserve(workers);
  for (int t = 0; t < workers; ++t) {
    threads.emplace_back([&]() {
      int i;
      while ((i = next.fetch_add(1)) < n) fn(i);
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// frames: (n, h, w, c) uint8 -> out: (n, th, tw, c) float32 in [-1, 1].
void preprocess_frames_pm1(const uint8_t* frames, int n, int h, int w, int c,
                           float* out, int th, int tw, int num_threads) {
  const size_t in_stride = static_cast<size_t>(h) * w * c;
  const size_t out_stride = static_cast<size_t>(th) * tw * c;
  parallel_for(n, num_threads, [&](int i) {
    process_one_frame(frames + i * in_stride, h, w, c, out + i * out_stride,
                      th, tw, nullptr, nullptr, /*to_pm1=*/true);
  });
}

// CLIP preprocessing: resize-short-side + center crop + per-channel
// normalize with the given mean/std (length-c arrays).
void preprocess_frames_clip(const uint8_t* frames, int n, int h, int w, int c,
                            float* out, int th, int tw, const float* mean,
                            const float* stdv, int num_threads) {
  const size_t in_stride = static_cast<size_t>(h) * w * c;
  const size_t out_stride = static_cast<size_t>(th) * tw * c;
  parallel_for(n, num_threads, [&](int i) {
    process_one_frame(frames + i * in_stride, h, w, c, out + i * out_stride,
                      th, tw, mean, stdv, /*to_pm1=*/false);
  });
}

// Horizontal flip in place: (n, h, w, c) float32.
void hflip_frames(float* frames, int n, int h, int w, int c,
                  int num_threads) {
  const size_t frame_stride = static_cast<size_t>(h) * w * c;
  parallel_for(n, num_threads, [&](int i) {
    float* f = frames + i * frame_stride;
    for (int y = 0; y < h; ++y) {
      float* row = f + static_cast<size_t>(y) * w * c;
      for (int x = 0; x < w / 2; ++x) {
        for (int ch = 0; ch < c; ++ch) {
          std::swap(row[x * c + ch], row[(w - 1 - x) * c + ch]);
        }
      }
    }
  });
}

}  // extern "C"
