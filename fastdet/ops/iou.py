"""Box IoU family — vectorised, jit-friendly (no data-dependent shapes).

Three IoU conventions coexist in the reference and all matter for parity:
  * CIoU on xywh pairs for the regression loss (utils/loss.py:8-51)
  * plain xyxy IoU for NMS (torchvision semantics, no +1)
  * xyxy IoU with the classic `+1` pixel convention for eval matching
    (utils/utils.py:76-107)
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax


def xywh2xyxy(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) cx,cy,w,h → x1,y1,x2,y2."""
    cx, cy, w, h = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def bbox_ciou(box1: jnp.ndarray, box2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise CIoU between aligned (..., 4) xywh boxes.

    Matches the reference training IoU (utils/loss.py:8-51, CIoU=True):
    union has +1e-16 on box1's area term, convex diagonal has +1e-16, and
    the aspect-ratio weight alpha is treated as a constant (stop_gradient).
    """
    b1_x1, b1_x2 = box1[..., 0] - box1[..., 2] / 2, box1[..., 0] + box1[..., 2] / 2
    b1_y1, b1_y2 = box1[..., 1] - box1[..., 3] / 2, box1[..., 1] + box1[..., 3] / 2
    b2_x1, b2_x2 = box2[..., 0] - box2[..., 2] / 2, box2[..., 0] + box2[..., 2] / 2
    b2_y1, b2_y2 = box2[..., 1] - box2[..., 3] / 2, box2[..., 1] + box2[..., 3] / 2

    inter = (jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0)
             * jnp.clip(jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0))

    w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1
    w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1
    union = (w1 * h1 + 1e-16) + w2 * h2 - inter
    iou = inter / union

    cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
    ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)
    c2 = cw ** 2 + ch ** 2 + 1e-16
    rho2 = (((b2_x1 + b2_x2) - (b1_x1 + b1_x2)) ** 2
            + ((b2_y1 + b2_y2) - (b1_y1 + b1_y2)) ** 2) / 4
    v = (4 / math.pi ** 2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
    alpha = lax.stop_gradient(v / (1 - iou + v))
    return iou - (rho2 / c2 + v * alpha)


def pairwise_iou_xyxy(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N,4) × (M,4) xyxy → (N,M) IoU, torchvision/NMS convention (no +1)."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-9)


def box_iou_xyxy(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(N,4) × (M,4) xyxy → (N,M) IoU with the reference eval's `+1`
    pixel convention (utils/utils.py:99-107)."""
    inter_w = jnp.clip(jnp.minimum(a[:, None, 2], b[None, :, 2])
                       - jnp.maximum(a[:, None, 0], b[None, :, 0]) + 1, 0)
    inter_h = jnp.clip(jnp.minimum(a[:, None, 3], b[None, :, 3])
                       - jnp.maximum(a[:, None, 1], b[None, :, 1]) + 1, 0)
    inter = inter_w * inter_h
    area_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    area_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-16)
