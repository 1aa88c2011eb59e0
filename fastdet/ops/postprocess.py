"""Fused inference: raw images → final detections in ONE XLA program.

This replaces the reference's three-stage host pipeline
(model forward → handel_preds python loop → torchvision NMS,
test.py:41-49) with a single jitted function: normalisation, backbone,
FPN, heads, anchor decode, and fixed-shape NMS all compile together, so
there is exactly one host→device and one device→host transfer.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from fastdet.config import Config
from fastdet.ops.decode import decode_outputs
from fastdet.ops.iou import xywh2xyxy
from fastdet.ops.nms import batched_nms, suppress_ranked


def postprocess_dense(outputs, anchors, input_hw, *, conf_thres=0.3,
                      iou_thres=0.45, max_det=300, max_nms=1024):
    """Decode ALL candidates, then NMS (the straightforward composition;
    kept as the semantics oracle for `postprocess`)."""
    decoded = decode_outputs(outputs, anchors, input_hw)
    boxes = decoded[..., :4]
    obj = decoded[..., 4]
    cls_scores = decoded[..., 5:]
    return batched_nms(boxes, obj, cls_scores, conf_thres=conf_thres,
                       iou_thres=iou_thres, max_det=max_det, max_nms=max_nms)


def _geo_table(meta, anchors, npad):
    """(8, Np) f32 geometry table: rows [cell x, cell y, stride,
    anchor w, anchor h, 0, 0, 0] per flat candidate index (flatten
    order (h, w, anchor), scales concatenated — identical arithmetic
    to the per-candidate where-chain below, but B-independent)."""
    j = lax.iota(jnp.int32, npad)
    cx = jnp.zeros((npad,), jnp.float32)
    cy = jnp.zeros((npad,), jnp.float32)
    strd = jnp.zeros((npad,), jnp.float32)
    anc_i = jnp.zeros((npad,), jnp.int32)
    base = 0
    for s, (cnt, h, w, a, stride) in enumerate(meta):
        local = j - base
        in_s = (j >= base) & (j < base + cnt)
        ci = local // a
        cx = jnp.where(in_s, (ci % w).astype(jnp.float32), cx)
        cy = jnp.where(in_s, (ci // w).astype(jnp.float32), cy)
        strd = jnp.where(in_s, jnp.asarray(stride, jnp.float32), strd)
        anc_i = jnp.where(in_s, s * a + local % a, anc_i)
        base += cnt
    awh = anchors.reshape(-1, 2)[anc_i]                     # (Np,2)
    z = jnp.zeros((npad,), jnp.float32)
    return jnp.stack([cx, cy, strd, awh[:, 0], awh[:, 1], z, z, z], 0)


def postprocess(outputs, anchors, input_hw, *, conf_thres=0.3,
                iou_thres=0.45, max_det=300, max_nms=1024,
                nms_kernel=None, fused=None, _upto=None):
    """Decode + NMS on a raw 6-tuple of head outputs — top-k-first.

    Equal output to `postprocess_dense` (the reference chain,
    utils/utils.py:232-358) but ranks candidates BEFORE decoding and
    decodes only the top `max_nms`:

      * the per-candidate score max_c(softmax(cls)[c]·sigmoid(obj))
        factors as sigmoid(obj)·max_c softmax(cls) — bitwise equal, since
        fp multiplication by a positive scalar is monotone — so no
        (B,N,classes) obj·cls product or anchor-broadcast of cls is ever
        materialised (the dense path's (B,1815,85) concat dominated its
        runtime: ~11 of ~34 µs/img on v5e);
      * the raw reg logits and class ids ride through ONE variadic
        `lax.sort` as payload operands instead of being gathered after a
        `top_k` (post-top_k gathers measured +3.6 µs/img on v5e; the
        payload sort is ~free).  The sort is `is_stable=False` with TWO
        keys (negated score, then `iota·classes + cls` — iota-dominant,
        so the composite second key is distinct per candidate and
        ascends exactly like the index): bitwise the stable-by-index
        tie rule, i.e. `top_k`'s, but the unstable 2-key form with the
        class id packed into the index key measured 0.8 vs 2.4 µs/img
        for the stable 7-operand form (r4 sort sweep; dropping to 6
        operands and dropping the stability machinery both contribute);
      * box decode (utils/utils.py:330-337 math) is elementwise per
        candidate, so decoding the top-k sorted raw logits equals
        gathering dense-decoded boxes;
      * cell/anchor/stride geometry is reconstructed arithmetically from
        the flat candidate index (flatten order (h, w, anchor), stride-16
        scale first — identical to decode_outputs).

    nms_kernel: run the greedy suppression as the VMEM-resident Pallas
    kernel (fastdet/kernels/nms_kernel.py — exact-equal; measured within
    noise of the XLA fixpoint at serving windows, kept as the TPU
    default for VMEM residency/scheduling isolation — see that module's
    header); None → auto (True on the TPU backend).

    fused: run serving-shaped windows through the fully fused
    rank→decode→NMS Pallas kernel (exact-equal to the staged path; see
    the dispatch comment below for the shape/precision bounds).  None →
    auto (take it whenever the bounds hold); False → force the staged
    path (perf diagnosis — tools/pp_breakdown.py times both so the last
    differenced row does not conflate the path switch with compaction
    cost).

    _upto: perf-diagnostic truncation (tools/pp_breakdown.py), mirroring
    build_fused_forward's `upto`: "scores" returns after the per-scale
    score/argmax flattening, "sorted" after the ranking sort, "decoded"
    after box decode, "keep" after the NMS keep mask (before
    compaction); None runs the full function.
    """
    num_scales = len(outputs) // 3
    b = outputs[0].shape[0]
    scores, objs, regs, clsargs = [], [], [], []
    meta = []                      # (count, h, w, A, stride) per scale
    for s in range(num_scales):
        reg, obj, cls = outputs[3 * s], outputs[3 * s + 1], outputs[3 * s + 2]
        _, h, w, _ = reg.shape
        a = obj.shape[-1]
        stride = input_hw[0] / reg.shape[1]
        obj_p = jax.nn.sigmoid(obj)                     # (B,h,w,A)
        cls_p = jax.nn.softmax(cls, axis=-1)            # (B,h,w,nc)
        cls_max = jnp.max(cls_p, axis=-1)               # (B,h,w)
        cls_arg = jnp.argmax(cls_p, axis=-1)            # (B,h,w)
        scores.append((obj_p * cls_max[..., None]).reshape(b, -1))
        objs.append(obj_p.reshape(b, -1))
        regs.append(reg.reshape(b, h * w, a, 4).reshape(b, -1, 4))
        clsargs.append(jnp.broadcast_to(
            cls_arg[..., None], (b, h, w, a)).reshape(b, -1))
        meta.append((h * w * a, h, w, a, stride))

    score = jnp.concatenate(scores, axis=1)             # (B,N)
    obj_f = jnp.concatenate(objs, axis=1)
    reg_f = jnp.concatenate(regs, axis=1)               # (B,N,4)
    cls_f = jnp.concatenate(clsargs, axis=1)            # (B,N) int
    n = score.shape[1]
    k = min(max_nms, n)

    valid = (obj_f > conf_thres) & (score > conf_thres)
    ranked = jnp.where(valid, score, -1.0)
    if _upto == "scores":
        return ranked, reg_f, cls_f
    iota = jnp.broadcast_to(
        lax.broadcasted_iota(jnp.int32, (1, n), 1), ranked.shape)
    nc = outputs[2].shape[-1]                 # classes (cls_f < nc)
    combo = iota * nc + cls_f

    if nms_kernel is None:
        nms_kernel = jax.default_backend() == "tpu"
    # serving windows (k ≤ 512, 128-aligned) run the fully fused
    # rank→decode→NMS kernel: a 2-operand sort (raw reg logits are
    # gathered in-VMEM by MXU one-hot matmuls instead of riding the
    # sort as payloads) feeding one Pallas program that decodes and
    # suppresses — exactly equal to the staged path below (pinned by
    # test; see fastdet/kernels/pp_fused.py for the bitwise argument).
    # n·nc < 2^23 guards the in-kernel f32 idx=floor((combo+0.5)/nc)
    # recovery: beyond 2^23, combo+0.5 rounds ties-to-even and an odd
    # combo with cls=nc−1 recovers the wrong index (the 2-key sort
    # itself is exact for any int32 combo; only the kernel's f32 carry
    # needs the bound).
    # k cap 384: at k=512 even a group-1 fused program measured 16.2 MB
    # of conservatively-stacked scoped VMEM on v5e (>16 MB limit,
    # tools/tpu_smoke.py); 512-wide windows take the staged path below
    # (its single-tile NMS kernel handles k ≤ 1024 on hardware).
    # k·npad cap: the kernel's one-hot gather is a (k, npad) f32 VMEM
    # tile per group member; 640² inputs (npad 6016, k 256 → 6.2 MB per
    # image) measured 27.9 MB of kernel stack on v5e and fail compile,
    # so large-n windows also take the staged path.  The bound is the
    # largest hardware-validated shape family (k=384 × npad=1920).
    npad128 = (n + 127) // 128 * 128
    if fused is None:
        fused = (nms_kernel and _upto is None and k <= 384
                 and k % 128 == 0 and n * nc < 2 ** 23
                 and k * npad128 <= 384 * 1920)
    if fused:
        from fastdet.kernels.pp_fused import rank_decode_nms
        from fastdet.kernels.nms_kernel import compact_ranked
        neg_s2, combo_s2 = lax.sort((-ranked, combo), dimension=1,
                                    is_stable=False, num_keys=2)
        neg_k2, combo_k2 = neg_s2[:, :k], combo_s2[:, :k]
        npad = (n + 127) // 128 * 128
        regs_lane = jnp.pad(reg_f, ((0, 0), (0, npad - n), (0, 0)))
        regs_lane = regs_lane.transpose(0, 2, 1)            # (B,4,Np)
        geo = _geo_table(meta, anchors, npad)
        keep, boxes_k2 = rank_decode_nms(
            neg_k2, combo_k2, regs_lane, geo, nc=nc, iou_thres=iou_thres,
            interpret=jax.default_backend() != "tpu")
        return compact_ranked(keep, boxes_k2, -neg_k2, combo_k2 % nc,
                              max_det=max_det)

    operands = (-ranked, combo,
                reg_f[..., 0], reg_f[..., 1], reg_f[..., 2], reg_f[..., 3])
    if _upto == "prep":
        return operands
    neg_s, combo_s, r0, r1, r2, r3 = lax.sort(
        operands, dimension=1, is_stable=False, num_keys=2)
    score_k = -neg_s[:, :k]                              # (B,k)
    order = combo_s[:, :k] // nc
    cls_k = combo_s[:, :k] % nc
    reg_k = jnp.stack([r0[:, :k], r1[:, :k], r2[:, :k], r3[:, :k]], axis=-1)
    if _upto == "sorted":
        return score_k, order, cls_k, reg_k

    # flat index → (cell x, cell y, stride, anchor row) per candidate
    cx = jnp.zeros_like(score_k)
    cy = jnp.zeros_like(score_k)
    strd = jnp.zeros_like(score_k)
    anc_i = jnp.zeros_like(order)
    base = 0
    for s, (cnt, h, w, a, stride) in enumerate(meta):
        local = order - base
        in_s = (order >= base) & (order < base + cnt)
        ci = local // a
        cx = jnp.where(in_s, (ci % w).astype(score_k.dtype), cx)
        cy = jnp.where(in_s, (ci // w).astype(score_k.dtype), cy)
        strd = jnp.where(in_s, jnp.asarray(stride, score_k.dtype), strd)
        anc_i = jnp.where(in_s, s * a + local % a, anc_i)
        base += cnt
    awh = anchors.reshape(-1, 2)[anc_i]                 # (B,k,2)

    sig = jax.nn.sigmoid(reg_k)
    xy = (sig[..., :2] * 2.0 - 0.5
          + jnp.stack([cx, cy], axis=-1)) * strd[..., None]
    wh = (sig[..., 2:4] * 2.0) ** 2 * awh
    boxes_k = xywh2xyxy(jnp.concatenate([xy, wh], axis=-1))
    valid_k = score_k > 0
    if _upto == "decoded":
        return boxes_k, score_k, cls_k

    if _upto == "keep":
        from fastdet.kernels.nms_kernel import keep_mask_batch
        return keep_mask_batch(boxes_k, score_k, cls_k, valid_k,
                               iou_thres=iou_thres)

    # (nms_kernel already resolved above) windows k ≤ 1024 run the
    # single-tile kernel; larger eval-grade windows run the blocked
    # (T,T)-tiled variant — both exact-equal to the XLA fixpoint
    if nms_kernel:
        from fastdet.kernels.nms_kernel import suppress_ranked_batch
        return suppress_ranked_batch(boxes_k, score_k, cls_k, valid_k,
                                     iou_thres=iou_thres, max_det=max_det)
    fn = functools.partial(suppress_ranked, iou_thres=iou_thres,
                           max_det=max_det)
    return jax.vmap(fn)(boxes_k, score_k, cls_k, valid_k)


def build_detect_fn(model, cfg: Config, *, conf_thres=0.3, iou_thres=0.45,
                    max_det=300, max_nms=1024,
                    dtype=jnp.float32, fused=None) -> Callable:
    """Returns jitted `detect(variables, images_u8_nhwc) -> (dets, counts)`.

    `images_u8_nhwc` is (B,H,W,3) uint8 (BGR, matching the reference's cv2
    pipeline); normalisation by /255 happens on device inside the program.

    fused: forwarded to `postprocess` — None auto-selects the fused
    rank→decode→NMS kernel on serving windows; True/False force it
    (tests pin fused == staged end-to-end on real images with it).
    """
    # NOTE: anchors are passed as a runtime argument, NOT baked in as a
    # compile-time constant.  Constant-broadcast multiplies against conv
    # outputs trigger a pathological (~4 min) compile and a degraded ~30 ms
    # dispatch path in the TPU compiler; as a traced argument the same
    # program compiles in seconds and dispatches in ~0.3 ms.
    anchors = jnp.asarray(
        np.asarray(cfg.anchors, np.float32).reshape(cfg.num_scales,
                                                    cfg.anchor_num, 2))
    input_hw = (cfg.height, cfg.width)

    @jax.jit
    def _detect(variables, images, anchors_arg):
        x = images.astype(dtype) / jnp.asarray(255.0, dtype)
        outputs = model.apply(variables, x, train=False)
        outputs = [o.astype(jnp.float32) for o in outputs]
        return postprocess(outputs, anchors_arg, input_hw,
                           conf_thres=conf_thres, iou_thres=iou_thres,
                           max_det=max_det, max_nms=max_nms, fused=fused)

    def detect(variables, images):
        return _detect(variables, images, anchors)

    return detect
