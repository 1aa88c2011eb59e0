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
