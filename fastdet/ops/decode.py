"""Anchor decode: raw head logits → per-anchor boxes/scores, one XLA fusion.

Reproduces the reference decode math (utils/utils.py:298-358 and the ncnn
C++ decode at sample/ncnn/src/yolo-fastestv2.cpp:134-183):
    xy = (sigmoid(r)·2 − 0.5 + cell) · stride
    wh = (sigmoid(r)·2)² · anchor_pixels
    obj = sigmoid(o);  cls = softmax(c) broadcast across anchors
Flatten order per scale is (h, w, anchor), stride-16 scale first — kept
identical so decoded tensors compare elementwise with the reference.

Unlike the reference (per-image Python loop with device→host round trips),
this is a single batched jit-compatible function.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def make_grid(h: int, w: int) -> jnp.ndarray:
    """(h, w, 2) grid of (x=col, y=row) cell coordinates."""
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    return jnp.stack([xs, ys], axis=-1)


def decode_scale(reg: jnp.ndarray, obj: jnp.ndarray, cls: jnp.ndarray,
                 anchors: jnp.ndarray, stride: float) -> jnp.ndarray:
    """Decode one scale.

    reg: (B,H,W,4A) raw; obj: (B,H,W,A) raw; cls: (B,H,W,nc) raw.
    anchors: (A,2) in input pixels.  Returns (B, H·W·A, 5+nc).
    """
    b, h, w, _ = reg.shape
    a = obj.shape[-1]
    nc = cls.shape[-1]

    r = reg.reshape(b, h, w, a, 4)
    grid = make_grid(h, w)[None, :, :, None, :]          # (1,H,W,1,2)
    xy = (jax.nn.sigmoid(r[..., :2]) * 2.0 - 0.5 + grid) * stride
    wh = (jax.nn.sigmoid(r[..., 2:4]) * 2.0) ** 2 * anchors[None, None, None]
    obj_p = jax.nn.sigmoid(obj)[..., None]               # (B,H,W,A,1)
    cls_p = jax.nn.softmax(cls, axis=-1)                 # (B,H,W,nc)
    cls_p = jnp.broadcast_to(cls_p[:, :, :, None, :], (b, h, w, a, nc))

    out = jnp.concatenate([xy, wh, obj_p, cls_p], axis=-1)
    return out.reshape(b, h * w * a, 5 + nc)


def decode_outputs(outputs: Sequence[jnp.ndarray], anchors: jnp.ndarray,
                   input_hw: Tuple[int, int]) -> jnp.ndarray:
    """Decode the 6-tuple (reg2, obj2, cls2, reg3, obj3, cls3).

    anchors: (num_scales, A, 2) in input pixels.
    Returns (B, Σ H·W·A, 5+nc), scales concatenated stride-16 first.
    """
    num_scales = len(outputs) // 3
    per_scale = []
    for s in range(num_scales):
        reg, obj, cls = outputs[3 * s], outputs[3 * s + 1], outputs[3 * s + 2]
        stride = input_hw[0] / reg.shape[1]
        per_scale.append(decode_scale(reg, obj, cls, anchors[s], stride))
    return jnp.concatenate(per_scale, axis=1)
