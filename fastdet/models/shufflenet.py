"""ShuffleNetV2 backbone, NHWC Flax.

Capability parity with /root/reference/model/backbone/shufflenetv2.py:5-114
(custom-width ShuffleNetV2: stem conv + maxpool, stages with repeats [4,8,4],
stride-16 and stride-32 feature maps returned), rebuilt TPU-first:

  * NHWC layout; channel shuffle is an even/odd channel de-interleave,
    which is exactly what the reference's reshape/permute trick computes
    on contiguous NCHW (pairs of adjacent channels are split into two
    halves: even-indexed → passthrough, odd-indexed → main branch).
  * Stride-2 blocks run the projection and main branches on the full
    input and concatenate (projection first).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from fastdet.models.layers import ConvBN


class ShuffleV2Block(nn.Module):
    """One ShuffleNetV2 unit (stride 1 or 2).

    stride 1: de-interleave channels into (even, odd); main branch
      [pw+BN+ReLU → dw3×3+BN → pw+BN+ReLU] on the odd half; concat.
    stride 2: projection branch [dw3×3 s2+BN → pw+BN+ReLU] on the full
      input, main branch on the full input; concat(proj, main).
    """

    inp: int           # channels entering the main branch
    oup: int           # total output channels of the block
    mid: int           # main-branch hidden width
    ksize: int = 3
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.stride in (1, 2)
        out_main = self.oup - self.inp
        k = (self.ksize, self.ksize)
        d = self.dtype

        def branch_main(y):
            y = ConvBN(self.mid, (1, 1), relu=True, dtype=d,
                       name="main_pw")(y, train)
            y = ConvBN(self.mid, k, stride=self.stride, groups=self.mid,
                       relu=False, dtype=d, name="main_dw")(y, train)
            y = ConvBN(out_main, (1, 1), relu=True, dtype=d,
                       name="main_pw_linear")(y, train)
            return y

        if self.stride == 1:
            x_proj = x[..., 0::2]
            x_main = x[..., 1::2]
            return jnp.concatenate([x_proj, branch_main(x_main)], axis=-1)

        # stride 2: both branches see the full input
        proj = ConvBN(self.inp, k, stride=2, groups=self.inp, relu=False,
                      dtype=d, name="proj_dw")(x, train)
        proj = ConvBN(self.inp, (1, 1), relu=True, dtype=d,
                      name="proj_pw")(proj, train)
        return jnp.concatenate([proj, branch_main(x)], axis=-1)


class ShuffleNetV2(nn.Module):
    """Backbone returning (C2, C3) at stride 16 / 32.

    stage_out_channels follows the reference convention
    [-1, stem, stage2, stage3, stage4] (detector.py:11).
    """

    stage_out_channels: Sequence[int] = (-1, 24, 48, 96, 192)
    stage_repeats: Sequence[int] = (4, 8, 4)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        stem = self.stage_out_channels[1]
        x = ConvBN(stem, (3, 3), stride=2, relu=True, dtype=self.dtype,
                   name="first_conv")(x, train)
        # 3×3 stride-2 maxpool, pad 1 (≙ nn.MaxPool2d(3, 2, 1))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = []
        input_channel = stem
        for idxstage, numrepeat in enumerate(self.stage_repeats):
            output_channel = self.stage_out_channels[idxstage + 2]
            for i in range(numrepeat):
                if i == 0:
                    x = ShuffleV2Block(
                        inp=input_channel, oup=output_channel,
                        mid=output_channel // 2, ksize=3, stride=2,
                        dtype=self.dtype,
                        name=f"stage{idxstage + 2}_{i}")(x, train)
                else:
                    x = ShuffleV2Block(
                        inp=input_channel // 2, oup=output_channel,
                        mid=output_channel // 2, ksize=3, stride=1,
                        dtype=self.dtype,
                        name=f"stage{idxstage + 2}_{i}")(x, train)
                input_channel = output_channel
            feats.append(x)

        # C2 = stage3 output (stride 16), C3 = stage4 output (stride 32)
        return feats[1], feats[2]
