// Native runtime helpers for animateportrait_tpu.
//
// The TPU compute path is JAX/XLA; this library covers the host-side hot
// loops around it (the reference leaned on PyTorch DataLoader workers for
// the same purpose):
//   - assemble_batch: crop + horizontal flip + [0,1]/[-1,1] normalize of
//     uint8 HWC images into one float32 NHWC batch, one thread per item.
//   - interleave_pcm: float -> int16 PCM conversion for the AVI muxer.
//
// Build: make -C native   (g++ -O3 -shared -fPIC, no external deps)
// Python binding: ctypes (animateportrait_tpu/utils/native.py).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// imgs[i]: pointer to uint8 HWC image of shape (in_h, in_w, channels).
// For item i, crop a (crop, crop) window at (crop_x[i], crop_y[i]),
// optionally mirror horizontally, and write float32 to
// out + i*crop*crop*channels as (v/255)*scale + offset.
// scale=2, offset=-1 reproduces torchvision ToTensor+Normalize(0.5,0.5);
// scale=1, offset=0 reproduces the mask transform (no normalize).
void assemble_batch(const uint8_t** imgs, int n, int in_h, int in_w,
                    int channels, const int* crop_x, const int* crop_y,
                    const uint8_t* flip, int crop, float scale,
                    float offset, float* out) {
  auto work = [&](int i) {
    const uint8_t* src = imgs[i];
    float* dst = out + static_cast<size_t>(i) * crop * crop * channels;
    const float k = scale / 255.0f;
    const int x0 = crop_x[i];
    const int y0 = crop_y[i];
    for (int y = 0; y < crop; ++y) {
      const uint8_t* row =
          src + (static_cast<size_t>(y0 + y) * in_w + x0) * channels;
      float* orow = dst + static_cast<size_t>(y) * crop * channels;
      if (flip[i]) {
        for (int x = 0; x < crop; ++x) {
          const uint8_t* px = row + static_cast<size_t>(crop - 1 - x) *
                                        channels;
          for (int c = 0; c < channels; ++c)
            orow[x * channels + c] = px[c] * k + offset;
        }
      } else {
        for (int x = 0; x < crop * channels; ++x)
          orow[x] = row[x] * k + offset;
      }
    }
  };
  unsigned hw = std::thread::hardware_concurrency();
  if (n <= 1 || hw <= 1) {
    for (int i = 0; i < n; ++i) work(i);
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(n);
  for (int i = 0; i < n; ++i) threads.emplace_back(work, i);
  for (auto& t : threads) t.join();
}

// float [-1,1] mono -> int16 PCM with clipping.
void float_to_pcm16(const float* x, int n, int16_t* out) {
  for (int i = 0; i < n; ++i) {
    float v = x[i] * 32768.0f;
    if (v > 32767.0f) v = 32767.0f;
    if (v < -32768.0f) v = -32768.0f;
    out[i] = static_cast<int16_t>(v);
  }
}

}  // extern "C"
