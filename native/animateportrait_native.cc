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

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

uint8_t* decode_png_rgb_impl(const char* path, int* h, int* w) {
  png_image image;
  memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return nullptr;
  // 16-bit files (FLAG_LINEAR) scale differently from PIL — defer to the
  // PIL fallback rather than silently diverge from the documented
  // byte-exact contract.
  if (image.format & PNG_FORMAT_FLAG_LINEAR) {
    png_image_free(&image);
    return nullptr;
  }
  // Decode as RGBA and drop alpha ourselves: PIL's convert("RGB") drops
  // the alpha channel, while libpng's RGB format would composite it
  // (against an uninitialized buffer when background is null).
  image.format = PNG_FORMAT_RGBA;
  uint8_t* rgba = static_cast<uint8_t*>(malloc(PNG_IMAGE_SIZE(image)));
  if (!rgba) { png_image_free(&image); return nullptr; }
  if (!png_image_finish_read(&image, nullptr, rgba, 0, nullptr)) {
    free(rgba);
    png_image_free(&image);
    return nullptr;
  }
  *h = static_cast<int>(image.height);
  *w = static_cast<int>(image.width);
  const size_t n = static_cast<size_t>(*h) * *w;
  uint8_t* rgb = static_cast<uint8_t*>(malloc(n * 3));
  if (!rgb) { free(rgba); return nullptr; }
  for (size_t i = 0; i < n; ++i) {
    rgb[i * 3 + 0] = rgba[i * 4 + 0];
    rgb[i * 3 + 1] = rgba[i * 4 + 1];
    rgb[i * 3 + 2] = rgba[i * 4 + 2];
  }
  free(rgba);
  return rgb;
}

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

uint8_t* decode_jpeg_rgb_impl(const char* path, int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  uint8_t* buf = nullptr;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    free(buf);
    return nullptr;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = static_cast<int>(cinfo.output_width);
  *h = static_cast<int>(cinfo.output_height);
  const size_t stride = static_cast<size_t>(*w) * 3;
  buf = static_cast<uint8_t*>(malloc(stride * *h));
  if (!buf) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return nullptr;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = buf + stride * cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return buf;
}

}  // namespace

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

// --- image decode (libpng / libjpeg), the data-loader's hot loop --------
//
// Decodes a PNG or JPEG file (detected by magic bytes) to uint8 HWC.
// channels_req 3 = RGB; 1 = grayscale using PIL's ITU-R 601-2 integer
// formula ((r*19595 + g*38470 + b*7471 + 0x8000) >> 16) so outputs are
// byte-exact with `PIL.Image.convert("L")`. PNG decode is lossless and
// byte-exact with PIL for RGB/gray/palette/alpha inputs (alpha handled
// like PIL convert: composite ignored, raw RGB channels kept).

// Returns a malloc'd RGB buffer (caller frees via decode_free), or null.
static uint8_t* decode_rgb(const char* path, int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  unsigned char magic[2] = {0, 0};
  size_t got = fread(magic, 1, 2, f);
  fclose(f);
  if (got != 2) return nullptr;
  if (magic[0] == 0x89 && magic[1] == 'P')
    return decode_png_rgb_impl(path, h, w);
  if (magic[0] == 0xFF && magic[1] == 0xD8)
    return decode_jpeg_rgb_impl(path, h, w);
  return nullptr;
}

// Two-call API for ctypes: first query dims (header parse only — no
// pixel decode), then decode into a caller-allocated buffer.
// decode_image returns 0 on success.
int image_size(const char* path, int* h, int* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  unsigned char magic[2] = {0, 0};
  size_t got = fread(magic, 1, 2, f);
  if (got != 2) { fclose(f); return -1; }
  if (magic[0] == 0x89 && magic[1] == 'P') {
    fclose(f);
    png_image image;
    memset(&image, 0, sizeof(image));
    image.version = PNG_IMAGE_VERSION;
    if (!png_image_begin_read_from_file(&image, path)) return -1;
    int rc = (image.format & PNG_FORMAT_FLAG_LINEAR) ? -1 : 0;  // 16-bit
    *h = static_cast<int>(image.height);
    *w = static_cast<int>(image.width);
    png_image_free(&image);
    return rc;
  }
  if (magic[0] == 0xFF && magic[1] == 0xD8) {
    rewind(f);
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
      jpeg_destroy_decompress(&cinfo);
      fclose(f);
      return -1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    *w = static_cast<int>(cinfo.image_width);
    *h = static_cast<int>(cinfo.image_height);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 0;
  }
  fclose(f);
  return -1;
}

int decode_image(const char* path, int channels_req, uint8_t* out,
                 int out_h, int out_w) {
  int h = 0, w = 0;
  uint8_t* rgb = decode_rgb(path, &h, &w);
  if (!rgb) return -1;
  if (h != out_h || w != out_w) { free(rgb); return -2; }
  const size_t n = static_cast<size_t>(h) * w;
  if (channels_req == 3) {
    memcpy(out, rgb, n * 3);
  } else {
    for (size_t i = 0; i < n; ++i) {
      const uint8_t* px = rgb + i * 3;
      out[i] = static_cast<uint8_t>(
          (px[0] * 19595u + px[1] * 38470u + px[2] * 7471u + 0x8000u) >> 16);
    }
  }
  free(rgb);
  return 0;
}

// (Batch-level threading lives on the Python side: the dataset's
// ThreadPoolExecutor parallelizes whole items, and decode_image releases
// the GIL for the duration of the C call.)

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
