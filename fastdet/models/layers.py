"""Shared NHWC conv building blocks (Flax linen).

TPU-first design notes:
  * Everything is NHWC — the native TPU conv layout (the reference is NCHW
    torch; we do NOT mirror that).
  * BatchNorm carries running stats in the `batch_stats` collection.
    torch BN(momentum=0.1) == linen BN(momentum=0.9); epsilon 1e-5 matches.
  * Convs are bias-free when followed by BN (reference does the same,
    e.g. /root/reference/model/fpn.py:12-25).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn


class ConvBN(nn.Module):
    """Conv2D (no bias) + BatchNorm + optional ReLU, NHWC.

    `groups=features_in` gives a depthwise conv (XLA feature_group_count).
    """

    features: int
    kernel: Tuple[int, int] = (1, 1)
    stride: int = 1
    groups: int = 1
    relu: bool = True
    dtype: Any = jnp.float32  # compute dtype; params stay fp32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel[0] // 2, self.kernel[1] // 2)
        x = nn.Conv(
            features=self.features,
            kernel_size=self.kernel,
            strides=(self.stride, self.stride),
            padding=((pad[0], pad[0]), (pad[1], pad[1])),
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            # two-pass variance E[(x-mu)^2], not E[x^2]-E[x]^2: the fast
            # form cancels catastrophically (batch-var error ~4e-4 f32 on
            # stage-4 activations) and makes sync-BN stats depend on the
            # device partitioning; two-pass is partition-invariant to
            # ~1e-7, so 1-process and N-process training agree
            # (tests/test_multihost.py pins this)
            use_fast_variance=False,
            name="bn",
        )(x)
        if self.relu:
            x = nn.relu(x)
        return x


class DWConvBlock(nn.Module):
    """Detection-head block: 2 × [dw k×k + BN + ReLU → pw 1×1 + BN (no ReLU)].

    Capability parity with the reference's head block
    (/root/reference/model/fpn.py:5-29), including the quirk that the second
    conv of each pair has NO ReLU after its BN.  channels→channels, stride 1.
    """

    features: int
    kernel: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = (self.kernel, self.kernel)
        d = self.dtype
        x = ConvBN(self.features, k, groups=self.features, relu=True,
                   dtype=d, name="dw1")(x, train)
        x = ConvBN(self.features, (1, 1), relu=False, dtype=d,
                   name="pw1")(x, train)
        x = ConvBN(self.features, k, groups=self.features, relu=True,
                   dtype=d, name="dw2")(x, train)
        x = ConvBN(self.features, (1, 1), relu=False, dtype=d,
                   name="pw2")(x, train)
        return x


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2× nearest-neighbour upsample, NHWC (≙ F.interpolate(scale_factor=2))."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)
