// Standalone serving demo: image file + dumped deploy-output maps → boxes.
//
// Native counterpart of the reference's ncnn demo (sample/ncnn/demo.cpp):
// the TPU produces the two deploy maps (export CLI / fastdet.serve dumps
// them as raw float32); this binary runs the full native host path —
// decode+resize the image, decode anchors, NMS — and writes a PPM with
// the detections drawn.
//
// Usage: fastdet_demo <image> <scale16.bin> <scale32.bin> <out.ppm>
//        [conf=0.3] [iou=0.4]

#include "fastdet_native.h"

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr int kInput = 352;
constexpr int kAnchors = 3;
constexpr int kClasses = 80;
// COCO anchors from data/coco.data
const float kAnchorTable[12] = {12.64f, 19.39f, 37.88f, 51.48f,
                                55.71f, 138.31f, 126.91f, 78.23f,
                                131.57f, 214.55f, 279.92f, 258.87f};

std::vector<float> read_floats(const char* path, size_t expect) {
  FILE* f = std::fopen(path, "rb");
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", path);
    std::exit(1);
  }
  std::vector<float> v(expect);
  size_t got = std::fread(v.data(), sizeof(float), expect, f);
  std::fclose(f);
  if (got != expect) {
    std::fprintf(stderr, "%s: expected %zu floats, got %zu\n", path, expect,
                 got);
    std::exit(1);
  }
  return v;
}

void draw_rect(uint8_t* img, int h, int w, int x1, int y1, int x2, int y2) {
  auto put = [&](int x, int y) {
    if (x < 0 || y < 0 || x >= w || y >= h) return;
    uint8_t* p = img + ((size_t)y * w + x) * 3;
    p[0] = 0; p[1] = 255; p[2] = 255;  // BGR yellow-ish
  };
  for (int x = x1; x <= x2; ++x) {
    put(x, y1); put(x, y1 + 1); put(x, y2); put(x, y2 - 1);
  }
  for (int y = y1; y <= y2; ++y) {
    put(x1, y); put(x1 + 1, y); put(x2, y); put(x2 - 1, y);
  }
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 5) {
    std::fprintf(stderr,
                 "usage: %s <image> <scale16.bin> <scale32.bin> <out.ppm> "
                 "[conf] [iou]\n",
                 argv[0]);
    return 2;
  }
  const float conf = argc > 5 ? std::atof(argv[5]) : 0.3f;
  const float iou = argc > 6 ? std::atof(argv[6]) : 0.4f;

  const int h16 = kInput / 16, w16 = kInput / 16;
  const int h32 = kInput / 32, w32 = kInput / 32;
  const int ch = 4 * kAnchors + kAnchors + kClasses;

  // preprocess (validates the image path end-to-end)
  std::vector<uint8_t> input((size_t)kInput * kInput * 3);
  const char* paths[1] = {argv[1]};
  if (fd_preprocess_batch(paths, 1, kInput, kInput, /*bgr=*/1, /*fast=*/0,
                          input.data()) != 0) {
    std::fprintf(stderr, "failed to load %s\n", argv[1]);
    return 1;
  }

  auto s16 = read_floats(argv[2], (size_t)h16 * w16 * ch);
  auto s32 = read_floats(argv[3], (size_t)h32 * w32 * ch);

  std::vector<FDBox> boxes(300);
  int count = 0;
  fd_postprocess(s16.data(), s32.data(), 1, h16, w16, h32, w32, kAnchors,
                 kClasses, kAnchorTable, kInput, kInput, conf, iou, 300,
                 boxes.data(), &count);

  std::printf("%d detections\n", count);
  for (int i = 0; i < count; ++i) {
    const FDBox& b = boxes[i];
    std::printf("cls=%d score=%.3f box=[%.1f %.1f %.1f %.1f]\n", b.cls,
                b.score, b.x1, b.y1, b.x2, b.y2);
    draw_rect(input.data(), kInput, kInput, (int)b.x1, (int)b.y1, (int)b.x2,
              (int)b.y2);
  }

  // write PPM (RGB)
  FILE* f = std::fopen(argv[4], "wb");
  if (!f) return 1;
  std::fprintf(f, "P6\n%d %d\n255\n", kInput, kInput);
  for (size_t p = 0; p < input.size(); p += 3) {  // BGR → RGB
    std::fputc(input[p + 2], f);
    std::fputc(input[p + 1], f);
    std::fputc(input[p], f);
  }
  std::fclose(f);
  std::printf("wrote %s\n", argv[4]);
  return 0;
}
