"""Fixed-shape on-device NMS (XLA), vmapped over the batch.

The reference hands NMS to torchvision's C++/CUDA kernel on host tensors
(utils/utils.py:232-296).  Here the whole thing — confidence filtering,
best-class selection, class-offset batched NMS, top-`max_det` capping —
is static-shape XLA so it fuses into the same program as the forward pass.

Semantics parity with the reference NMS:
  * pre-filter: obj_conf > conf_thres
  * conf = obj_conf · cls_conf, single best class per box
  * second filter: conf > conf_thres
  * greedy suppression in score order with the class-offset trick
    (cls · 4096 added to coords), IoU without the +1 convention
  * at most `max_det` (300) detections, score-descending

Output is fixed-shape: (B, max_det, 6) [x1,y1,x2,y2,conf,cls] plus a
(B,) count of valid rows; invalid rows are zero.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from fastdet.ops.iou import xywh2xyxy

_MAX_WH = 4096.0  # class-offset multiplier (reference utils/utils.py:240)


def _nms_single(boxes_xywh, obj, cls_scores, *, conf_thres, iou_thres,
                max_det, max_nms):
    """One image.  boxes_xywh (N,4) pixels, obj (N,), cls_scores (N,nc)."""
    n = boxes_xywh.shape[0]
    k = min(max_nms, n)

    conf = cls_scores * obj[:, None]                 # obj·cls
    best_conf = jnp.max(conf, axis=-1)
    best_cls = jnp.argmax(conf, axis=-1)

    valid = (obj > conf_thres) & (best_conf > conf_thres)
    score = jnp.where(valid, best_conf, -1.0)

    # rank by score, keep top-k candidates (static shape)
    score_k, order = jax.lax.top_k(score, k)
    boxes_k = xywh2xyxy(boxes_xywh[order])
    cls_k = best_cls[order]
    valid_k = score_k > 0
    return suppress_ranked(boxes_k, score_k, cls_k, valid_k,
                           iou_thres=iou_thres, max_det=max_det)


def suppress_ranked(boxes_k, score_k, cls_k, valid_k, *, iou_thres,
                    max_det):
    """Greedy class-aware suppression of score-DESCENDING candidates.

    boxes_k (k,4) xyxy, score_k (k,) descending, cls_k (k,) int,
    valid_k (k,) bool → ((max_det,6) [x1,y1,x2,y2,conf,cls], n_keep).
    The tail of the reference NMS (utils/utils.py:283-296); split out so
    callers that rank candidates themselves (fastdet/ops/postprocess.py's
    top-k-first path) can reuse it."""
    k = boxes_k.shape[0]

    # class-offset trick: boxes of different classes never overlap
    off_boxes = boxes_k + (cls_k.astype(boxes_k.dtype) * _MAX_WH)[:, None]

    # pairwise IoU (k,k), torchvision convention
    area = (off_boxes[:, 2] - off_boxes[:, 0]) * (off_boxes[:, 3] - off_boxes[:, 1])
    lt = jnp.maximum(off_boxes[:, None, :2], off_boxes[None, :, :2])
    rb = jnp.minimum(off_boxes[:, None, 2:], off_boxes[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    iou = inter / (area[:, None] + area[None, :] - inter + 1e-9)

    # Greedy suppression as a fixpoint iteration instead of a serial scan.
    # overlap is restricted to strictly-higher-ranked suppressors (strict
    # lower-triangular), so iterating
    #     keep ← valid ∧ ¬∃ j<i: overlap[i,j] ∧ keep[j]
    # stabilises the prefix of the dependency DAG one level per step and
    # converges to EXACT greedy NMS in at most chain-depth iterations
    # (typically <10; bounded by k).  Each step is one (k,k)·(k) matvec on
    # the MXU — so this is both fast and cheap to compile, unlike a
    # k-step fori_loop.
    ranks = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    overlap = ((iou > iou_thres)
               & (ranks < jax.lax.broadcasted_iota(jnp.int32, (k, k), 0))
               & valid_k[None, :]).astype(jnp.float32)

    def cond(state):
        i, keep, prev = state
        return jnp.logical_and(i < k, jnp.any(keep != prev))

    def step(state):
        i, keep, _ = state
        sup = overlap @ keep.astype(jnp.float32)
        new_keep = jnp.logical_and(valid_k, sup == 0.0)
        return i + 1, new_keep, keep

    _, keep, _ = jax.lax.while_loop(
        cond, step,
        (jnp.int32(0), valid_k, jnp.zeros((k,), jnp.bool_)))

    # compact kept rows to the front, preserving score order; non-kept and
    # over-max_det ranks scatter out of bounds and are dropped
    kept_rank = jnp.where(keep, jnp.cumsum(keep) - 1, k + max_det)
    n_keep = jnp.minimum(jnp.sum(keep), max_det)

    rows = jnp.concatenate(
        [boxes_k, score_k[:, None], cls_k.astype(boxes_k.dtype)[:, None]],
        axis=-1)
    det = jnp.zeros((max_det, 6), boxes_k.dtype).at[kept_rank].set(
        rows, mode="drop")
    return det, n_keep


def batched_nms(boxes_xywh, obj, cls_scores, *, conf_thres=0.3,
                iou_thres=0.45, max_det=300, max_nms=1024):
    """Batched fixed-shape NMS.

    boxes_xywh (B,N,4), obj (B,N), cls_scores (B,N,nc) →
    detections (B,max_det,6) + counts (B,).
    """
    fn = functools.partial(_nms_single, conf_thres=conf_thres,
                           iou_thres=iou_thres, max_det=max_det,
                           max_nms=max_nms)
    return jax.vmap(fn)(boxes_xywh, obj, cls_scores)
