/* fastdet native host runtime — C API.
 *
 * TPU-native counterpart of the reference's ncnn C++ deployment lib
 * (/root/reference/sample/ncnn/src/yolo-fastestv2.{h,cpp}): the TPU runs
 * the exported deploy graph (activations baked in, NHWC per-scale maps);
 * this library provides the host half of the serving pipeline —
 * image decode + resize into input tensors, and anchor decode + NMS from
 * the deploy maps back to boxes — in C++ with OpenMP, callable from C,
 * C++, or Python (ctypes).
 */
#ifndef FASTDET_NATIVE_H_
#define FASTDET_NATIVE_H_

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct {
  float x1, y1, x2, y2; /* pixels in model-input coordinates */
  float score;          /* obj * best-class probability */
  int cls;
} FDBox;

/* Decode + NMS over a batch of two-scale deploy output maps.
 *
 * s16 / s32: NHWC float maps (B, h, w, 4*anchor_num + anchor_num +
 * classes) with sigmoid (reg, obj) and softmax (cls) already applied by
 * the exported graph.  anchors: 2 scales * anchor_num * 2 floats, pixel
 * units, stride-16 scale first.  out must hold B*max_det FDBox; counts
 * must hold B ints.  Returns 0 on success.
 */
int fd_postprocess(const float* s16, const float* s32, int batch,
                   int h16, int w16, int h32, int w32, int anchor_num,
                   int classes, const float* anchors, int input_w,
                   int input_h, float conf_thres, float iou_thres,
                   int max_det, FDBox* out, int* counts);

/* Decode JPEG/PNG files and bilinear-resize (OpenCV INTER_LINEAR
 * geometry: src = (dst + 0.5) * scale - 0.5, no letterbox) into a packed
 * uint8 NHWC tensor.  channels_bgr!=0 emits BGR (cv2 convention).
 * fast_decode!=0 decodes JPEGs at the smallest covering M/8 scaled-DCT
 * size with fast IDCT (~2x cheaper; pixel values differ slightly from
 * the full decode).  Parallel over images (OpenMP).  Returns 0 on
 * success, else the 1-based index of the first file that failed.
 */
int fd_preprocess_batch(const char** paths, int n, int dst_w, int dst_h,
                        int channels_bgr, int fast_decode, uint8_t* out);

/* Bilinear-resize a raw uint8 HWC image (any channel count up to 4). */
void fd_resize_bilinear(const uint8_t* src, int sh, int sw, int ch,
                        uint8_t* dst, int dh, int dw);

/* Repack an (h, w, 3) uint8 image into the TPU fused-stem
 * space-to-depth(4) layout: dst (48, npad) uint8, channel =
 * yoff*12 + xoff*3 + c, lanes the (h/4, w/4) stride-4 grid, zero tail.
 */
void fd_pack_s2d(const uint8_t* src, int h, int w, uint8_t* dst,
                 int npad);

/* fd_preprocess_batch emitting the s2d(4) layout directly: out is
 * (n, 48, pad128(dst_h/4 * dst_w/4)) uint8. */
int fd_preprocess_batch_s2d(const char** paths, int n, int dst_w,
                            int dst_h, int channels_bgr, int fast_decode,
                            uint8_t* out);

/* Library version tag (for the ctypes wrapper to sanity check). */
int fd_version(void);

#ifdef __cplusplus
}
#endif

#endif /* FASTDET_NATIVE_H_ */
