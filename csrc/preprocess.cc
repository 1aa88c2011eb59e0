// Host-side image pipeline: JPEG/PNG decode + bilinear resize, OpenMP
// parallel over a batch.  This is the native data-loader counterpart of
// the reference's per-sample cv2 pipeline (utils/datasets.py:105-110):
// BGR channel order, OpenCV INTER_LINEAR sample geometry
// (src = (dst + 0.5) * scale - 0.5), no letterboxing.

#include "fastdet_native.h"

#include <cstdio>  // jpeglib.h needs FILE declared before inclusion

#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

// Decodes a JPEG into RGB HWC uint8; returns true on success.
// target_w/target_h > 0 enable scaled-DCT decoding: the smallest M/8
// IDCT scale whose output still covers the target in both dimensions
// (plus fast IDCT + plain chroma upsampling) — decoding a 640x480 JPEG
// for a 352x352 input runs the IDCT at 5/8 scale, ~2x cheaper, and the
// bilinear resize then only ever downsamples.
bool decode_jpeg(FILE* f, std::vector<uint8_t>* rgb, int* h, int* w,
                 int target_w, int target_h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  if (target_w > 0 && target_h > 0) {
    int m = 8;
    for (int cand = 1; cand <= 8; ++cand) {
      const long ow = ((long)cinfo.image_width * cand + 7) / 8;
      const long oh = ((long)cinfo.image_height * cand + 7) / 8;
      if (ow >= target_w && oh >= target_h) {
        m = cand;
        break;
      }
    }
    if (m < 8) {  // m == 8 is a full decode — keep full quality
      cinfo.scale_num = m;
      cinfo.scale_denom = 8;
      cinfo.dct_method = JDCT_IFAST;
      cinfo.do_fancy_upsampling = FALSE;
    }
  }
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  rgb->resize((size_t)(*w) * (*h) * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* rowp = rgb->data() + (size_t)cinfo.output_scanline * (*w) * 3;
    jpeg_read_scanlines(&cinfo, &rowp, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(FILE* f, std::vector<uint8_t>* rgb, int* h, int* w) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_expand(png);           // palette/gray/tRNS → 8-bit RGB(A)
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  rgb->resize((size_t)(*w) * (*h) * 3);
  std::vector<png_bytep> rows(*h);
  for (int y = 0; y < *h; ++y)
    rows[y] = rgb->data() + (size_t)y * (*w) * 3;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// target_w/target_h > 0 enable the scaled-DCT JPEG fast path (PNG has
// no scaled decode; it always decodes in full).
bool load_image_rgb(const char* path, std::vector<uint8_t>* rgb, int* h,
                    int* w, int target_w = 0, int target_h = 0) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  unsigned char magic[8] = {0};
  size_t got = std::fread(magic, 1, 8, f);
  std::rewind(f);
  bool ok = false;
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, rgb, h, w, target_w, target_h);
  } else if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    ok = decode_png(f, rgb, h, w);
  }
  std::fclose(f);
  return ok;
}

}  // namespace

extern "C" void fd_resize_bilinear(const uint8_t* src, int sh, int sw,
                                   int ch, uint8_t* dst, int dh, int dw) {
  const float sy = (float)sh / dh;
  const float sx = (float)sw / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)std::floor(fy);
    float wy = fy - y0;
    int y1 = y0 + 1;
    y0 = std::clamp(y0, 0, sh - 1);
    y1 = std::clamp(y1, 0, sh - 1);
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = (int)std::floor(fx);
      float wx = fx - x0;
      int x1 = x0 + 1;
      x0 = std::clamp(x0, 0, sw - 1);
      x1 = std::clamp(x1, 0, sw - 1);
      const uint8_t* p00 = src + ((size_t)y0 * sw + x0) * ch;
      const uint8_t* p01 = src + ((size_t)y0 * sw + x1) * ch;
      const uint8_t* p10 = src + ((size_t)y1 * sw + x0) * ch;
      const uint8_t* p11 = src + ((size_t)y1 * sw + x1) * ch;
      uint8_t* o = dst + ((size_t)y * dw + x) * ch;
      for (int c = 0; c < ch; ++c) {
        const float v = (1 - wy) * ((1 - wx) * p00[c] + wx * p01[c]) +
                        wy * ((1 - wx) * p10[c] + wx * p11[c]);
        o[c] = (uint8_t)std::lround(std::clamp(v, 0.f, 255.f));
      }
    }
  }
}

extern "C" int fd_preprocess_batch(const char** paths, int n, int dst_w,
                                   int dst_h, int channels_bgr,
                                   int fast_decode, uint8_t* out) {
  int first_fail = 0;
#pragma omp parallel for schedule(dynamic)
  for (int i = 0; i < n; ++i) {
    std::vector<uint8_t> rgb;
    int h = 0, w = 0;
    if (!load_image_rgb(paths[i], &rgb, &h, &w,
                        fast_decode ? dst_w : 0,
                        fast_decode ? dst_h : 0)) {
#pragma omp critical
      if (first_fail == 0 || i + 1 < first_fail) first_fail = i + 1;
      continue;
    }
    if (channels_bgr) {
      for (size_t p = 0; p < rgb.size(); p += 3)
        std::swap(rgb[p], rgb[p + 2]);
    }
    fd_resize_bilinear(rgb.data(), h, w, 3,
                       out + (size_t)i * dst_h * dst_w * 3, dst_h, dst_w);
  }
  return first_fail;
}

// Space-to-depth(4) channel-first repack for the TPU fused-stem input
// contract (fastdet/kernels/fused_infer.py::pack_images_s2d): dst is
// (48, npad) uint8, channel = yoff*12 + xoff*3 + c, lanes the
// (h/4, w/4) stride-4 pixel grid (row-major), tail zero-padded.
extern "C" void fd_pack_s2d(const uint8_t* src, int h, int w,
                            uint8_t* dst, int npad) {
  const int h4 = h / 4, w4 = w / 4;
  const int hw = h4 * w4;
  for (int yoff = 0; yoff < 4; ++yoff) {
    for (int xoff = 0; xoff < 4; ++xoff) {
      for (int c = 0; c < 3; ++c) {
        uint8_t* plane = dst + (size_t)(yoff * 12 + xoff * 3 + c) * npad;
        for (int i = 0; i < h4; ++i) {
          const uint8_t* row = src + ((size_t)(4 * i + yoff) * w + xoff) * 3 + c;
          uint8_t* o = plane + (size_t)i * w4;
          for (int j = 0; j < w4; ++j) o[j] = row[(size_t)j * 12];
        }
        if (npad > hw) std::memset(plane + hw, 0, npad - hw);
      }
    }
  }
}

// fd_preprocess_batch, but emitting the s2d(4) layout directly:
// out is (n, 48, npad) uint8 with npad = pad128(dst_h/4 * dst_w/4).
extern "C" int fd_preprocess_batch_s2d(const char** paths, int n,
                                       int dst_w, int dst_h,
                                       int channels_bgr, int fast_decode,
                                       uint8_t* out) {
  const int npad = ((dst_h / 4) * (dst_w / 4) + 127) / 128 * 128;
  int first_fail = 0;
#pragma omp parallel for schedule(dynamic)
  for (int i = 0; i < n; ++i) {
    std::vector<uint8_t> rgb;
    int h = 0, w = 0;
    if (!load_image_rgb(paths[i], &rgb, &h, &w,
                        fast_decode ? dst_w : 0,
                        fast_decode ? dst_h : 0)) {
#pragma omp critical
      if (first_fail == 0 || i + 1 < first_fail) first_fail = i + 1;
      continue;
    }
    if (channels_bgr) {
      for (size_t p = 0; p < rgb.size(); p += 3)
        std::swap(rgb[p], rgb[p + 2]);
    }
    std::vector<uint8_t> resized((size_t)dst_h * dst_w * 3);
    fd_resize_bilinear(rgb.data(), h, w, 3, resized.data(), dst_h, dst_w);
    fd_pack_s2d(resized.data(), dst_h, dst_w,
                out + (size_t)i * 48 * npad, npad);
  }
  return first_fail;
}
