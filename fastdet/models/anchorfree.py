"""Anchor-free single-scale detector (FastestDet-style model family).

The BASELINE.json stretch config asks for an anchor-free FastestDet-style
head alongside the anchor-based Yolo-FastestV2.  This is our own
TPU-first design in that spirit (not a port): the same ShuffleNetV2
backbone feeds a single stride-16 detection scale (the stride-16 stage
concatenated with the 2× upsampled stride-32 stage), and a decoupled
depthwise-separable head predicts per-cell [obj, cls…, dx, dy, w, h]
with no anchor boxes:

    cx = (gx + σ(dx)·2 − 0.5) · stride
    cy = (gy + σ(dy)·2 − 0.5) · stride
    w  = σ(w)² · input_w          (box size as a fraction of the image)
    h  = σ(h)² · input_h

The σ² size parameterization keeps decode monotone and bounded (no exp
overflow) and needs no k-means anchors.  Training assigns each GT to its
center cell plus the YOLO-style near-neighbor cells; obj is BCE over the
grid, box is CIoU, cls is softmax-CE at assigned cells.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fastdet.models.layers import ConvBN, DWConvBlock, upsample_nearest_2x
from fastdet.models.shufflenet import ShuffleNetV2


class AnchorFreeDetector(nn.Module):
    """Single-scale anchor-free detector; returns (obj, cls, reg) NHWC
    maps at stride 16, or their decoded concat in deploy mode."""

    classes: int = 80
    out_depth: int = 96
    stage_out_channels: Tuple[int, ...] = (-1, 24, 48, 96, 192)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, deploy: bool = False):
        x = x.astype(self.dtype)
        backbone = ShuffleNetV2(self.stage_out_channels, dtype=self.dtype,
                                name="backbone")
        # need stage2 (stride 8) as well: re-run the stages explicitly
        C2, C3 = backbone(x, train)          # stride 16, 32

        P = jnp.concatenate([C2, upsample_nearest_2x(C3)], axis=-1)
        S = ConvBN(self.out_depth, (1, 1), relu=True, dtype=self.dtype,
                   name="fuse")(P, train)

        feat_cls = DWConvBlock(self.out_depth, 5, dtype=self.dtype,
                               name="head_cls")(S, train)
        feat_reg = DWConvBlock(self.out_depth, 5, dtype=self.dtype,
                               name="head_reg")(S, train)

        obj = nn.Conv(1, (1, 1), use_bias=True, dtype=self.dtype,
                      name="out_obj")(feat_cls)
        cls = nn.Conv(self.classes, (1, 1), use_bias=True, dtype=self.dtype,
                      name="out_cls")(feat_cls)
        reg = nn.Conv(4, (1, 1), use_bias=True, dtype=self.dtype,
                      name="out_reg")(feat_reg)

        if deploy:
            return jnp.concatenate(
                [jax.nn.sigmoid(reg), jax.nn.sigmoid(obj),
                 jax.nn.softmax(cls, axis=-1)], axis=-1)
        return obj, cls, reg


def decode_anchorfree(obj, cls, reg, input_hw: Tuple[int, int]):
    """Raw maps → (boxes_xywh (B,N,4) pixels, obj (B,N), cls (B,N,nc))."""
    from fastdet.ops.decode import make_grid

    b, h, w, _ = obj.shape
    nc = cls.shape[-1]
    stride = input_hw[0] / h
    grid = make_grid(h, w)[None]
    r = jax.nn.sigmoid(reg.astype(jnp.float32))
    xy = (r[..., :2] * 2.0 - 0.5 + grid) * stride
    wh = (r[..., 2:4] ** 2) * jnp.asarray(
        [input_hw[1], input_hw[0]], jnp.float32)
    boxes = jnp.concatenate([xy, wh], -1).reshape(b, h * w, 4)
    obj_p = jax.nn.sigmoid(obj.astype(jnp.float32)).reshape(b, h * w)
    cls_p = jax.nn.softmax(cls.astype(jnp.float32), -1).reshape(b, h * w, nc)
    return boxes, obj_p, cls_p


def build_anchorfree_detect_fn(model: AnchorFreeDetector, input_hw,
                               conf_thres=0.3, iou_thres=0.45,
                               max_det=300, max_nms=128):
    """Fused jitted image→detections for the anchor-free family."""
    from fastdet.ops.nms import batched_nms

    @jax.jit
    def detect(variables, images):
        x = images.astype(model.dtype) / jnp.asarray(255.0, model.dtype)
        obj, cls, reg = model.apply(variables, x, train=False)
        boxes, obj_p, cls_p = decode_anchorfree(obj, cls, reg, input_hw)
        return batched_nms(boxes, obj_p, cls_p, conf_thres=conf_thres,
                           iou_thres=iou_thres, max_det=max_det,
                           max_nms=max_nms)

    return detect


def build_anchorfree_fused_detect(variables, input_hw=(352, 352),
                                  conf_thres=0.3, iou_thres=0.45,
                                  max_det=300, max_nms=128,
                                  dtype=jnp.bfloat16, interpret=False):
    """Pallas fused serving path for the anchor-free family:
    → (detect(packed, images_s2d_u8) → (dets, counts), packed_weights).

    Shares the fused ShuffleNetV2 stem/span kernels with the
    anchor-based family (fastdet/kernels/fused_infer.py,
    head="anchorfree"); input is the s2d(4) uint8 host layout
    (`pack_images_s2d`).  `packed` must stay a runtime argument of any
    enclosing jit (never a baked constant)."""
    from fastdet.kernels.fused_infer import build_fused_forward
    from fastdet.ops.nms import batched_nms

    fwd, packed = build_fused_forward(
        variables, input_hw=input_hw, dtype=dtype, interpret=interpret,
        input_format="s2d_u8", head="anchorfree")

    def detect(packed, images):
        obj, cls, reg = fwd(images, packed)
        boxes, obj_p, cls_p = decode_anchorfree(obj, cls, reg, input_hw)
        return batched_nms(boxes, obj_p, cls_p, conf_thres=conf_thres,
                           iou_thres=iou_thres, max_det=max_det,
                           max_nms=max_nms)

    return detect, packed


def anchorfree_loss(outputs, labels, label_mask, input_hw):
    """Dense anchor-free loss: center+neighbor cell assignment, CIoU box,
    BCE obj over the grid, softmax-CE cls at assigned cells.

    outputs: (obj (B,H,W,1), cls (B,H,W,nc), reg (B,H,W,4)) raw logits.
    labels: (B,M,5) [cls,cx,cy,w,h] normalized; label_mask (B,M)."""
    from jax import lax

    from fastdet.ops.iou import bbox_ciou
    from fastdet.train.loss import _bce_logits, _masked_mean
    from fastdet.train.targets import _OFFSETS

    obj, cls, reg = (o.astype(jnp.float32) for o in outputs)
    b, h, w, _ = obj.shape
    nc = cls.shape[-1]

    cls_t = labels[..., 0].astype(jnp.int32)                   # (B,M)
    gxy = labels[..., 1:3] * jnp.asarray([w, h], jnp.float32)
    gwh_n = labels[..., 3:5]                                   # normalized

    gx, gy = gxy[..., 0], gxy[..., 1]
    inv_x, inv_y = w - gx, h - gy
    j = (gx % 1.0 < 0.5) & (gx > 1.0)
    k = (gy % 1.0 < 0.5) & (gy > 1.0)
    l = (inv_x % 1.0 < 0.5) & (inv_x > 1.0)
    m_ = (inv_y % 1.0 < 0.5) & (inv_y > 1.0)
    off_ok = jnp.stack([jnp.ones_like(j), j, k, l, m_], -1)    # (B,M,O)
    mask = label_mask[:, :, None] & off_ok                     # (B,M,O)

    offs = jnp.asarray(_OFFSETS)
    cand = gxy[:, :, None, :] - offs[None, None]
    gij = jnp.floor(cand).astype(jnp.int32)
    gi = jnp.clip(gij[..., 0], 0, w - 1)                       # (B,M,O)
    gj = jnp.clip(gij[..., 1], 0, h - 1)

    bm, mm, oo = mask.shape
    b_idx = lax.broadcasted_iota(jnp.int32, (bm, mm, oo), 0)
    maskf = mask.astype(jnp.float32)

    # box: CIoU in grid units
    ps = reg[b_idx, gj, gi]                                    # (B,M,O,4)
    pxy = jax.nn.sigmoid(ps[..., :2]) * 2.0 - 0.5
    pwh = (jax.nn.sigmoid(ps[..., 2:4]) ** 2
           * jnp.asarray([w, h], jnp.float32))                 # grid units
    dxy = gxy[:, :, None, :] - jnp.stack([gi, gj], -1).astype(jnp.float32)
    twh = gwh_n[:, :, None, :] * jnp.asarray([w, h], jnp.float32)
    tbox = jnp.concatenate(
        [dxy, jnp.broadcast_to(twh, dxy.shape)], -1)
    tbox = jnp.where(mask[..., None], tbox, jnp.asarray([0., 0., 1., 1.]))
    pbox = jnp.concatenate([pxy, pwh], -1)
    ciou = bbox_ciou(pbox, tbox)
    lbox = _masked_mean(1.0 - ciou, maskf)

    # obj: BCE over the grid, target 1 at assigned cells
    tobj = jnp.zeros((b, h, w), jnp.float32).at[b_idx, gj, gi].max(maskf)
    lobj = jnp.mean(_bce_logits(obj[..., 0], tobj))

    # cls at assigned cells
    logp = jax.nn.log_softmax(cls[b_idx, gj, gi], -1)
    ce = -jnp.take_along_axis(
        logp, cls_t[:, :, None, None], axis=-1)[..., 0]
    lcls = _masked_mean(ce, maskf) / nc if nc > 1 else 0.0

    lbox = lbox * 3.2
    lobj = lobj * 64.0
    lcls = lcls * 32.0
    total = lbox + lobj + lcls
    return total, {"box": lbox, "obj": lobj, "cls": lcls, "total": total}
