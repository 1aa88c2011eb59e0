#!/usr/bin/env python
"""Post-training int8 quantization CLI.

Calibrates activation scales over a set of images and writes one .npz
artifact (int8 kernels + weight scales + biases + activation scales) —
the role of ncnn's int8 calibration-table workflow in the reference's
deploy chain (export → ncnnoptimize → int8 inference; the reference
runs the exported net in sample/ncnn/src/yolo-fastestv2.cpp), rebuilt
TPU-native on the folded deploy graph (fastdet/quant/ptq.py).

Usage:
  python cli/quantize.py --data data/coco.data --weights weights/coco.npz \
      --calib <image-dir | val-list.txt> --n 32 --output weights/coco-int8.npz
  # then: python cli/test.py --data ... --int8 weights/coco-int8.npz --img ...
"""

import argparse
import glob
import os

import _bootstrap  # noqa: F401
import cv2
import numpy as np

_IMG_EXT = (".jpg", ".jpeg", ".png", ".bmp")


def load_calib_images(source: str, n: int, size_wh) -> np.ndarray:
    """First `n` images from a directory or a darknet-style list file,
    resized to the network input (INTER_LINEAR, BGR — the reference's
    preprocessing, test.py:28-30) → (n,H,W,3) uint8."""
    if os.path.isdir(source):
        paths = sorted(
            p for p in glob.glob(os.path.join(source, "*"))
            if p.lower().endswith(_IMG_EXT))
    else:
        with open(source) as f:
            paths = [ln.strip() for ln in f if ln.strip()]
    paths = paths[:n]
    if not paths:
        raise SystemExit(f"no calibration images found in {source}")
    imgs = []
    for p in paths:
        img = cv2.imread(p)
        if img is None:
            raise SystemExit(f"unreadable calibration image: {p}")
        imgs.append(cv2.resize(img, size_wh, interpolation=cv2.INTER_LINEAR))
    return np.stack(imgs).astype(np.uint8)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=str, required=True,
                        help="Specify training profile *.data")
    parser.add_argument("--weights", type=str, required=True,
                        help="f32 model weights (.npz/.pth/checkpoint dir)")
    parser.add_argument("--calib", type=str, default="",
                        help="calibration images: directory or list file "
                             "(default: the profile's val list)")
    parser.add_argument("--n", type=int, default=32,
                        help="number of calibration images")
    parser.add_argument("--batch", type=int, default=8,
                        help="calibration forward batch size")
    parser.add_argument("--method", type=str, default="percentile",
                        choices=("percentile", "max"),
                        help="activation calibration: percentile "
                             "histogram clip (robust, default) or max-|x|")
    parser.add_argument("--percentile", type=float, default=0.9999,
                        help="histogram clip point for --method "
                             "percentile")
    parser.add_argument("--output", type=str, required=True,
                        help="output artifact path (.npz)")
    opt = parser.parse_args()

    from fastdet.config import Config, resolve_path
    cfg = Config.from_file(opt.data)
    calib_src = opt.calib or resolve_path(cfg.val, opt.data)
    images = load_calib_images(calib_src, opt.n, (cfg.width, cfg.height))
    print(f"calibrating on {len(images)} images from {calib_src}")

    import jax
    import jax.numpy as jnp
    # calibrate at eval-grade f32 (TPU f32 convs otherwise run as bf16
    # passes — see cli/evaluation.py); the scales feed int8 inference
    jax.config.update("jax_default_matmul_precision", "highest")
    from fastdet.io import load_variables
    from fastdet.quant import (calibrate, fold_model, quantize_weights,
                               save_quantized)

    variables = jax.tree.map(jnp.asarray, load_variables(opt.weights))
    folded = fold_model(variables)
    scales = calibrate(folded, images, batch=opt.batch)
    qw = quantize_weights(folded)
    save_quantized(opt.output, qw, scales)
    size = os.path.getsize(opt.output) / 1024.0
    print(f"saved {opt.output} ({size:.0f} KiB, {len(qw)} quantized ops)")


if __name__ == "__main__":
    main()
