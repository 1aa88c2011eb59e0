#!/usr/bin/env python
"""Model export CLI (fills the role of the reference pytorch2onnx.py):
serializes the deploy-mode forward (activations + NHWC concat baked in)
as a portable StableHLO program."""

import argparse
import os

import _bootstrap  # noqa: F401


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=str, default="",
                        help="Specify training profile *.data")
    parser.add_argument("--weights", type=str, default="",
                        help="The path of the model weights to export")
    parser.add_argument("--output", type=str, default="./model.stablehlo",
                        help="The path where the exported model is saved")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--int8", type=str, default="",
                        help="export the int8 PTQ deploy forward from a "
                             "cli/quantize.py artifact (.npz) instead of "
                             "f32 weights")
    parser.add_argument("--mlir", action="store_true",
                        help="also dump human-readable StableHLO text")
    opt = parser.parse_args()

    from fastdet.config import Config
    cfg = Config.from_file(opt.data)
    assert opt.int8 or os.path.exists(opt.weights), "invalid weights path"

    import jax
    import jax.numpy as jnp
    from fastdet.export.stablehlo import export_detector, export_stablehlo_text
    from fastdet.io import load_variables
    from fastdet.models import Detector

    if opt.int8:
        from fastdet.export.stablehlo import export_quantized
        from fastdet.quant import load_quantized
        qw, scales = load_quantized(opt.int8)
        blob = export_quantized(qw, scales, opt.output,
                                input_hw=(cfg.height, cfg.width),
                                batch=opt.batch)
        print(f"exported {len(blob)} bytes -> {opt.output}")
        return

    model = Detector(classes=cfg.classes, anchor_num=cfg.anchor_num)
    variables = jax.tree.map(jnp.asarray, load_variables(opt.weights))

    blob = export_detector(model, variables, opt.output,
                           input_hw=(cfg.height, cfg.width),
                           batch=opt.batch)
    print(f"exported {len(blob)} bytes -> {opt.output}")
    if opt.mlir:
        text = export_stablehlo_text(model, variables,
                                     (cfg.height, cfg.width), opt.batch)
        with open(opt.output + ".mlir", "w") as f:
            f.write(text)
        print(f"wrote {opt.output}.mlir")


if __name__ == "__main__":
    main()
