"""StableHLO export of the deploy-mode forward pass.

Fills the role of the reference's pytorch2onnx.py → onnx2ncnn chain:
the exported artifact is a serialized StableHLO program with the deploy
transformations baked in (sigmoid on reg/obj, channel-softmax on cls,
per-scale NHWC concat — the same graph surgery detector.py:33-44 bakes
into its ONNX export), plus the weights embedded as constants, loadable
by any PJRT runtime (TPU/CPU) via jax.export.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def export_detector(model, variables: dict, out_path: str,
                    input_hw: Tuple[int, int] = (352, 352),
                    batch: Optional[int] = 1) -> bytes:
    """Serialize `images_u8 → (scale16_map, scale32_map)` deploy forward.

    The exported function takes a (batch,H,W,3) uint8 NHWC image tensor
    and returns the two per-scale (batch,h,w,4A+A+classes) activation
    maps with sigmoid/softmax already applied.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    h, w = input_hw

    def deploy_fn(images):
        x = images.astype(jnp.float32) / 255.0
        return model.apply(variables, x, train=False, deploy=True)

    spec = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.uint8)
    exported = jexport.export(jax.jit(deploy_fn))(spec)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(blob)
    return blob


def load_exported(path: str):
    """Deserialize an exported program; returns a callable."""
    from jax import export as jexport
    with open(path, "rb") as f:
        blob = f.read()
    exported = jexport.deserialize(blob)
    return exported.call


def export_quantized(qw, scales, out_path: str,
                     input_hw: Tuple[int, int] = (352, 352),
                     batch: Optional[int] = 1) -> bytes:
    """Serialize the int8 PTQ deploy forward (fastdet/quant/ptq.py) as a
    StableHLO program — the quantized counterpart of `export_detector`
    (the role of ncnn's int8 model artifact downstream of its
    calibration-table step).  Same contract: (batch,H,W,3) uint8 NHWC →
    per-scale (batch,h,w,·) maps with sigmoid/softmax baked in (two maps
    for the anchor-based family, one stride-16 map ordered like
    AnchorFreeDetector's deploy mode for the anchor-free family — the
    artifact self-describes via its op names); the int8 kernels + scales
    are embedded as constants."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from fastdet.quant import forward_from
    from fastdet.quant.ptq import infer_family

    h, w = input_hw
    fwd = forward_from(qw, scales)
    anchorfree = infer_family(qw) == "anchorfree"

    def m(reg, obj, cls):
        return jnp.concatenate(
            [jax.nn.sigmoid(reg), jax.nn.sigmoid(obj),
             jax.nn.softmax(cls, axis=-1)], axis=-1)

    def deploy_fn(images):
        if anchorfree:
            obj, cls, reg = fwd(images)
            return m(reg, obj, cls)
        reg2, obj2, cls2, reg3, obj3, cls3 = fwd(images)
        return m(reg2, obj2, cls2), m(reg3, obj3, cls3)

    spec = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.uint8)
    exported = jexport.export(jax.jit(deploy_fn))(spec)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(blob)
    return blob


def export_stablehlo_text(model, variables: dict,
                          input_hw: Tuple[int, int] = (352, 352),
                          batch: int = 1) -> str:
    """Human-readable StableHLO MLIR of the deploy forward (debugging /
    downstream compiler toolchains)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    h, w = input_hw

    def deploy_fn(images):
        x = images.astype(jnp.float32) / 255.0
        return model.apply(variables, x, train=False, deploy=True)

    spec = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.uint8)
    exported = jexport.export(jax.jit(deploy_fn))(spec)
    return exported.mlir_module()
