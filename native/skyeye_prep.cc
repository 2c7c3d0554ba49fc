// skyeye_prep: native host-side preprocessing for the TPU input pipeline.
//
// The reference's data path is Python + OpenCV in torch DataLoader workers
// (SURVEY.md §3.1 "CPU-side hot loop: dataloader workers doing cv2 decode").
// This library replaces that hot loop with a C++ thread pool that decodes JPEGs
// (libjpeg) and letterboxes (bilinear resize + gray-114 pad, identical geometry to
// skyeye_tpu/ops/letterbox.py) straight into a caller-provided pinned NHWC uint8
// batch buffer — one memcpy away from the device transfer.
//
// C ABI (ctypes-friendly):
//   int sp_prep_batch(const char** paths, int n, unsigned char* out,
//                     int out_h, int out_w, int n_threads, float* meta);
//     - out: n * out_h * out_w * 3 bytes, RGB, letterboxed (pad value 114)
//     - meta: n * 3 floats per image [gain, dw, dh] for box rescaling
//     - returns number of successfully decoded images (failed slots are zeroed)
//   int sp_decode_shape(const char* path, int* h, int* w);  // peek dimensions
//
// Build: make -C native  (produces libskyeye_prep.so)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr unsigned char kPad = 114;

struct Image {
  std::vector<unsigned char> data;  // RGB, HWC
  int h = 0, w = 0;
};

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

bool ends_with(const std::string& s, const char* suf) {
  std::string l = s;
  std::transform(l.begin(), l.end(), l.begin(), ::tolower);
  std::string e(suf);
  return l.size() >= e.size() && l.compare(l.size() - e.size(), e.size(), e) == 0;
}

bool decode_jpeg(const char* path, Image* im) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  im->w = cinfo.output_width;
  im->h = cinfo.output_height;
  im->data.resize(static_cast<size_t>(im->w) * im->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = im->data.data() +
                         static_cast<size_t>(cinfo.output_scanline) * im->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

bool decode_png(const char* path, Image* im) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr,
                                           nullptr);
  if (!png) {
    fclose(f);
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_expand(png);
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  im->w = png_get_image_width(png, info);
  im->h = png_get_image_height(png, info);
  im->data.resize(static_cast<size_t>(im->w) * im->h * 3);
  std::vector<png_bytep> rows(im->h);
  for (int y = 0; y < im->h; ++y)
    rows[y] = im->data.data() + static_cast<size_t>(y) * im->w * 3;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return true;
}

bool decode(const char* path, Image* im) {
  std::string p(path);
  if (ends_with(p, ".png")) return decode_png(path, im);
  return decode_jpeg(path, im);  // jpeg is the default for aerial datasets
}

// Bilinear resize + center letterbox pad into out (out_h, out_w, 3) RGB.
// Geometry matches ops/letterbox.py letterbox_params (scaleup=true).
void letterbox_into(const Image& im, unsigned char* out, int out_h, int out_w,
                    float* meta) {
  const float r = std::min(static_cast<float>(out_h) / im.h,
                           static_cast<float>(out_w) / im.w);
  const int new_w = static_cast<int>(std::lround(im.w * r));
  const int new_h = static_cast<int>(std::lround(im.h * r));
  const float dw = (out_w - new_w) / 2.0f;
  const float dh = (out_h - new_h) / 2.0f;
  const int x0 = static_cast<int>(std::lround(dw - 0.1f));
  const int y0 = static_cast<int>(std::lround(dh - 0.1f));

  std::memset(out, kPad, static_cast<size_t>(out_h) * out_w * 3);

  const float sx = static_cast<float>(im.w) / new_w;
  const float sy = static_cast<float>(im.h) / new_h;
  for (int y = 0; y < new_h; ++y) {
    const float fy = (y + 0.5f) * sy - 0.5f;
    const int iy0 = std::max(0, std::min(im.h - 1, static_cast<int>(fy)));
    const int iy1 = std::min(im.h - 1, iy0 + 1);
    const float wy = std::max(0.0f, std::min(1.0f, fy - iy0));
    unsigned char* dst = out + (static_cast<size_t>(y + y0) * out_w + x0) * 3;
    const unsigned char* row0 = im.data.data() + static_cast<size_t>(iy0) * im.w * 3;
    const unsigned char* row1 = im.data.data() + static_cast<size_t>(iy1) * im.w * 3;
    for (int x = 0; x < new_w; ++x) {
      const float fx = (x + 0.5f) * sx - 0.5f;
      const int ix0 = std::max(0, std::min(im.w - 1, static_cast<int>(fx)));
      const int ix1 = std::min(im.w - 1, ix0 + 1);
      const float wx = std::max(0.0f, std::min(1.0f, fx - ix0));
      for (int c = 0; c < 3; ++c) {
        const float top = row0[ix0 * 3 + c] + wx * (row0[ix1 * 3 + c] - row0[ix0 * 3 + c]);
        const float bot = row1[ix0 * 3 + c] + wx * (row1[ix1 * 3 + c] - row1[ix0 * 3 + c]);
        dst[x * 3 + c] = static_cast<unsigned char>(top + wy * (bot - top) + 0.5f);
      }
    }
  }
  if (meta) {
    meta[0] = r;
    meta[1] = dw;
    meta[2] = dh;
  }
}

// 4x4 space-to-depth pack: (S, S, 3) RGB -> (S/4, S/4, 48) with channel
// (dy*4+dx)*3 + c — the TPU packed-stem input layout (skyeye_tpu/ops/
// packed_stem.py s2d4_host). Packing here saves the numpy transpose per batch
// and keeps the whole ingest path native.
void s2d4_pack(const unsigned char* frame, unsigned char* out, int s) {
  const int q = s / 4;
  for (int oy = 0; oy < q; ++oy) {
    for (int dy = 0; dy < 4; ++dy) {
      const unsigned char* src_row = frame + (static_cast<size_t>(oy) * 4 + dy) * s * 3;
      for (int ox = 0; ox < q; ++ox) {
        unsigned char* dst = out + (static_cast<size_t>(oy) * q + ox) * 48 + dy * 12;
        std::memcpy(dst, src_row + static_cast<size_t>(ox) * 12, 12);
      }
    }
  }
}

}  // namespace

extern "C" {

int sp_decode_shape(const char* path, int* h, int* w) {
  Image im;
  if (!decode(path, &im)) return -1;
  *h = im.h;
  *w = im.w;
  return 0;
}

// Like sp_prep_batch but emits the 4x4 space-to-depth packed layout:
// out is n * (out_s/4) * (out_s/4) * 48 bytes (out_s must be a multiple of 4).
// Feeds the TPU packed-stem executable directly — zero Python-side reshaping.
int sp_prep_batch_s2d4(const char** paths, int n, unsigned char* out, int out_s,
                       int n_threads, float* meta) {
  if (n <= 0 || out_s % 4 != 0) return 0;
  const size_t frame_bytes = static_cast<size_t>(out_s) * out_s * 3;
  std::atomic<int> next(0), ok(0);
  const int workers = std::max(1, std::min(n_threads > 0 ? n_threads : 8, n));

  auto work = [&]() {
    std::vector<unsigned char> scratch(frame_bytes);
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      Image im;
      unsigned char* dst = out + frame_bytes * i;
      if (decode(paths[i], &im) && im.w > 0 && im.h > 0) {
        letterbox_into(im, scratch.data(), out_s, out_s,
                       meta ? meta + 3 * i : nullptr);
        s2d4_pack(scratch.data(), dst, out_s);
        ok.fetch_add(1);
      } else {
        std::memset(dst, 0, frame_bytes);
        if (meta) meta[3 * i] = 0.0f;
      }
    }
  };

  std::vector<std::thread> pool;
  pool.reserve(workers - 1);
  for (int t = 1; t < workers; ++t) pool.emplace_back(work);
  work();
  for (auto& t : pool) t.join();
  return ok.load();
}

int sp_prep_batch(const char** paths, int n, unsigned char* out, int out_h,
                  int out_w, int n_threads, float* meta) {
  if (n <= 0) return 0;
  const size_t frame = static_cast<size_t>(out_h) * out_w * 3;
  std::atomic<int> next(0), ok(0);
  const int workers = std::max(1, std::min(n_threads > 0 ? n_threads : 8, n));

  auto work = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      Image im;
      if (decode(paths[i], &im) && im.w > 0 && im.h > 0) {
        letterbox_into(im, out + frame * i, out_h, out_w,
                       meta ? meta + 3 * i : nullptr);
        ok.fetch_add(1);
      } else {
        std::memset(out + frame * i, 0, frame);
        if (meta) meta[3 * i] = 0.0f;
      }
    }
  };

  std::vector<std::thread> pool;
  pool.reserve(workers - 1);
  for (int t = 1; t < workers; ++t) pool.emplace_back(work);
  work();
  for (auto& t : pool) t.join();
  return ok.load();
}

}  // extern "C"
