"""Yolo-FastestV2 detector: backbone + FPN + decoupled heads, NHWC Flax.

Capability parity with /root/reference/model/detector.py:7-47:
  * 3 decoupled 1×1 convs WITH bias: reg → 4·anchor_num ch, obj →
    anchor_num ch, cls → classes ch.
  * The SAME head conv weights are applied at both pyramid scales
    (detector.py:25-31) — expressed here by calling one linen submodule
    twice, which shares parameters.
  * Train/eval forward returns the raw-logit 6-tuple
    (reg2, obj2, cls2, reg3, obj3, cls3), each NHWC.
  * `deploy=True` (≙ export_onnx) applies sigmoid to reg/obj and
    channel-softmax to cls and concatenates per scale to
    (N, H, W, 4A + A + classes) — already NHWC, no permute needed.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fastdet.models.fpn import LightFPN
from fastdet.models.shufflenet import ShuffleNetV2


class Detector(nn.Module):
    classes: int = 80
    anchor_num: int = 3
    out_depth: int = 72
    stage_out_channels: Tuple[int, ...] = (-1, 24, 48, 96, 192)
    dtype: Any = jnp.float32  # compute dtype (bf16 for serving/training
                              # speed); params always fp32

    @nn.compact
    def __call__(self, x, train: bool = False, deploy: bool = False):
        x = x.astype(self.dtype)
        C2, C3 = ShuffleNetV2(self.stage_out_channels, dtype=self.dtype,
                              name="backbone")(x, train)
        cls_2, obj_2, reg_2, cls_3, obj_3, reg_3 = LightFPN(
            self.out_depth, dtype=self.dtype, name="fpn")(C2, C3, train)

        head_reg = nn.Conv(4 * self.anchor_num, (1, 1), use_bias=True,
                           dtype=self.dtype, name="output_reg")
        head_obj = nn.Conv(self.anchor_num, (1, 1), use_bias=True,
                           dtype=self.dtype, name="output_obj")
        head_cls = nn.Conv(self.classes, (1, 1), use_bias=True,
                           dtype=self.dtype, name="output_cls")

        out_reg_2, out_obj_2, out_cls_2 = head_reg(reg_2), head_obj(obj_2), head_cls(cls_2)
        out_reg_3, out_obj_3, out_cls_3 = head_reg(reg_3), head_obj(obj_3), head_cls(cls_3)

        if deploy:
            def bake(reg, obj, cls):
                return jnp.concatenate(
                    [jax.nn.sigmoid(reg), jax.nn.sigmoid(obj),
                     jax.nn.softmax(cls, axis=-1)], axis=-1)
            return bake(out_reg_2, out_obj_2, out_cls_2), \
                   bake(out_reg_3, out_obj_3, out_cls_3)

        return out_reg_2, out_obj_2, out_cls_2, out_reg_3, out_obj_3, out_cls_3
