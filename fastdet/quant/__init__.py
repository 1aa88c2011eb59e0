"""Post-training int8 quantization for TPU deploy.

Fills the role of ncnn's int8 quantized inference for the reference's
deploy path (the reference exports to ncnn, whose runtime supports int8
conv; sample/ncnn/src/yolo-fastestv2.cpp runs the exported net) —
rebuilt TPU-native: per-output-channel symmetric int8 weights,
calibrated per-tensor symmetric int8 activations, and int8×int8→int32
`lax.dot_general` contractions that XLA lowers onto the MXU's integer
path.
"""

from fastdet.quant.ptq import (build_int8_forward, calibrate, fold_model,
                               forward_folded, forward_folded_af,
                               forward_from, infer_family, load_quantized,
                               quantize_weights, save_quantized)

__all__ = ["build_int8_forward", "calibrate", "fold_model",
           "forward_folded", "forward_folded_af", "forward_from",
           "infer_family", "load_quantized", "quantize_weights",
           "save_quantized"]
