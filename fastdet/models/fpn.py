"""Light two-scale FPN neck, NHWC Flax.

Capability parity with /root/reference/model/fpn.py:31-64:
  * S3 = 1×1 ConvBN+ReLU on C3; S2 = 1×1 ConvBN+ReLU on
    concat(upsample2x(C3), C2).
  * Per scale, a cls-head and a reg-head DWConvBlock; the obj branch
    SHARES the cls head's feature map (obj_s = cls_s — fpn.py:54,61).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from fastdet.models.layers import ConvBN, DWConvBlock, upsample_nearest_2x


class LightFPN(nn.Module):
    out_depth: int = 72
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, C2, C3, train: bool = False):
        d = self.dtype
        S3 = ConvBN(self.out_depth, (1, 1), relu=True, dtype=d,
                    name="conv1x1_3")(C3, train)
        cls_3 = DWConvBlock(self.out_depth, 5, dtype=d,
                            name="cls_head_3")(S3, train)
        obj_3 = cls_3
        reg_3 = DWConvBlock(self.out_depth, 5, dtype=d,
                            name="reg_head_3")(S3, train)

        P2 = jnp.concatenate([upsample_nearest_2x(C3), C2], axis=-1)
        S2 = ConvBN(self.out_depth, (1, 1), relu=True, dtype=d,
                    name="conv1x1_2")(P2, train)
        cls_2 = DWConvBlock(self.out_depth, 5, dtype=d,
                            name="cls_head_2")(S2, train)
        obj_2 = cls_2
        reg_2 = DWConvBlock(self.out_depth, 5, dtype=d,
                            name="reg_head_2")(S2, train)

        return cls_2, obj_2, reg_2, cls_3, obj_3, reg_3
