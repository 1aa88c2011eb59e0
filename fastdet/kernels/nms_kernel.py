"""VMEM-resident greedy-NMS suppression kernel.

Same fixpoint as fastdet/ops/nms.py::suppress_ranked (vmapped XLA) —
``keep ← valid ∧ ¬∃ j<i: overlap[i,j] ∧ keep[j]`` — with the (k, k)
IoU/overlap matrices built and iterated entirely in VMEM, a group of
images per program.  Measured (1× v5e, b256/k256): ~0.4 µs/img faster
than the XLA formulation inside the full fused-detect program (XLA
fuses the fixpoint better than its HBM shapes suggest; under an
adversarial dense-overlap load the two are within noise of each other
— the matrix build + fixpoint structure, not HBM traffic, dominate
both).  Kept as the default TPU path: it frees XLA from scheduling the
while-loop and pins the suppression's working set in VMEM regardless
of surrounding program pressure.

Semantics are EXACTLY fastdet/ops/nms.py::suppress_ranked (reference
tail utils/utils.py:283-296 with the class-offset trick):
  * same f32 IoU arithmetic → bitwise-identical threshold compares;
  * the matvec counts 0/1 floats (≤ k ≤ 2^24), exact in the MXU's f32
    accumulation, so ``sup == 0`` matches the XLA path bit for bit;
  * iterate-to-convergence (bounded by k), not a fixed trip count.

Layout notes: the kernel needs each box coordinate both as a lane
vector (candidate axis i) and a sublane vector (suppressor axis j).
Lane→sublane transposition inside a TPU kernel is awkward, so the
wrapper passes the (k, 4) boxes twice — natural and transposed — and
both validity vectors likewise; 8 KB/image of duplicated input buys a
transpose-free kernel.

k > 512 (eval-grade NMS windows, max_nms=2048, reference cap 30k at
utils/utils.py:278-280) dispatches to the BLOCKED variant
(`_suppress_kernel_tiled`): greedy NMS factors exactly over rank-ordered
blocks — earlier blocks' final keep vectors pre-suppress later blocks
via (1,T)×(T,T) matvecs, then the usual triangular fixpoint runs on the
diagonal tile — so VMEM never holds more than a couple of (512,512)
tiles no matter how wide the window (the 16 MB scoped-VMEM limit of
v5e-lite rejects 1024² tiling at compile time).  Exact-equal to the XLA fixpoint
(pinned by tests), closing the one window class that previously had to
fall back to XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_WH = 4096.0  # class-offset multiplier (reference utils/utils.py:240)


def _suppress_kernel(obt_ref, obc_ref, sct_ref, scc_ref, o_ref, *,
                     iou_thres: float, group: int):
    """`group` images per program: off_boxes (g,4,k)+(g,k,4), validity
    flags ±1 (g,1,k)+(g,k,1) → keep (g,1,k).  lanes index candidate i,
    sublanes index suppressor j.  The group amortizes per-program launch
    overhead; the fixpoint applies 4 steps per convergence check
    (idempotent at the fixpoint, so over-stepping is exact)."""
    k = obt_ref.shape[-1]
    lane_i = lax.broadcasted_iota(jnp.int32, (k, k), 1)
    sub_j = lax.broadcasted_iota(jnp.int32, (k, k), 0)
    tri = sub_j < lane_i

    overlaps, valids = [], []
    for g in range(group):
        x1r, y1r = obt_ref[g, 0:1, :], obt_ref[g, 1:2, :]  # (1,k) by i
        x2r, y2r = obt_ref[g, 2:3, :], obt_ref[g, 3:4, :]
        x1c, y1c = obc_ref[g, :, 0:1], obc_ref[g, :, 1:2]  # (k,1) by j
        x2c, y2c = obc_ref[g, :, 2:3], obc_ref[g, :, 3:4]
        inter = (jnp.clip(jnp.minimum(x2r, x2c) - jnp.maximum(x1r, x1c), 0)
                 * jnp.clip(jnp.minimum(y2r, y2c) - jnp.maximum(y1r, y1c), 0))
        area_i = (x2r - x1r) * (y2r - y1r)
        area_j = (x2c - x1c) * (y2c - y1c)
        iou = inter / (area_i + area_j - inter + 1e-9)
        valid_col = scc_ref[g] > 0.0                       # (k,1) by j
        # overlapT[j, i]: candidate i suppressed by kept higher-rank j
        overlaps.append(jnp.where((iou > iou_thres) & tri & valid_col,
                                  1.0, 0.0))
        valids.append(jnp.where(sct_ref[g] > 0.0, 1.0, 0.0))  # (1,k)

    valid_f = jnp.concatenate(valids, 0)                   # (g,k)

    def apply(keep):
        outs = []
        for g in range(group):
            sup = lax.dot_general(keep[g:g + 1], overlaps[g],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
            outs.append(jnp.where(sup == 0.0, 1.0, 0.0))
        return valid_f * jnp.concatenate(outs, 0)

    def cond(state):
        it, keep, prev = state
        return jnp.logical_and(it < k + 4, jnp.any(keep != prev))

    def step(state):
        it, keep, _ = state
        new = keep
        for _ in range(4):
            new = apply(new)
        return it + 4, new, keep

    _, keep, _ = lax.while_loop(
        cond, step, (jnp.int32(0), valid_f, jnp.zeros_like(valid_f)))
    for g in range(group):
        o_ref[g] = keep[g:g + 1]


def _suppress_kernel_tiled(obt_ref, obc_ref, sct_ref, scc_ref, o_ref, *,
                           iou_thres: float, tile: int, nblocks: int):
    """One image per program, candidates partitioned into `nblocks`
    rank-ordered blocks of `tile`: blocked greedy NMS for k > the
    single-tile VMEM budget (eval-grade windows, max_nms=2048).

    Exact — greedy suppression factors over rank blocks:
      * cross-block: a candidate in block t is pre-suppressed iff a KEPT
        candidate in an earlier block overlaps it (one (1,T)x(T,T)
        matvec per earlier block, keep vector already final);
      * within-block: the usual strict-lower-triangular fixpoint on the
        (T,T) diagonal tile, seeded with the pre-suppression mask.
    Only (T,T) matrices ever exist, so VMEM holds ~2 tiles regardless
    of k."""
    T = tile
    lane_i = lax.broadcasted_iota(jnp.int32, (T, T), 1)
    sub_j = lax.broadcasted_iota(jnp.int32, (T, T), 0)
    tri = sub_j < lane_i

    def overlap_tile(ti, tj, triangular):
        """(T,T) 0/1 overlap of suppressor block tj (sublanes j) against
        candidate block ti (lanes i), masked to valid suppressors."""
        x1r = obt_ref[0, 0:1, ti * T:(ti + 1) * T]
        y1r = obt_ref[0, 1:2, ti * T:(ti + 1) * T]
        x2r = obt_ref[0, 2:3, ti * T:(ti + 1) * T]
        y2r = obt_ref[0, 3:4, ti * T:(ti + 1) * T]
        x1c = obc_ref[0, tj * T:(tj + 1) * T, 0:1]
        y1c = obc_ref[0, tj * T:(tj + 1) * T, 1:2]
        x2c = obc_ref[0, tj * T:(tj + 1) * T, 2:3]
        y2c = obc_ref[0, tj * T:(tj + 1) * T, 3:4]
        inter = (jnp.clip(jnp.minimum(x2r, x2c) - jnp.maximum(x1r, x1c), 0)
                 * jnp.clip(jnp.minimum(y2r, y2c) - jnp.maximum(y1r, y1c),
                            0))
        area_i = (x2r - x1r) * (y2r - y1r)
        area_j = (x2c - x1c) * (y2c - y1c)
        iou = inter / (area_i + area_j - inter + 1e-9)
        hit = (iou > iou_thres) & (scc_ref[0, tj * T:(tj + 1) * T] > 0.0)
        if triangular:
            hit = hit & tri
        return jnp.where(hit, 1.0, 0.0)

    def mv(vec, mat):
        return lax.dot_general(vec, mat, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    keeps = []
    for ti in range(nblocks):
        sup = jnp.zeros((1, T), jnp.float32)
        for tj in range(ti):
            sup = sup + mv(keeps[tj], overlap_tile(ti, tj, False))
        valid_f = jnp.where(
            (sct_ref[0, :, ti * T:(ti + 1) * T] > 0.0) & (sup == 0.0),
            1.0, 0.0)                                      # (1,T)
        ovd = overlap_tile(ti, ti, True)

        def apply(kp):
            return valid_f * jnp.where(mv(kp, ovd) == 0.0, 1.0, 0.0)

        def cond(state):
            it, kp, prev = state
            return jnp.logical_and(it < T + 4, jnp.any(kp != prev))

        def step(state):
            it, kp, _ = state
            new = kp
            for _ in range(4):
                new = apply(new)
            return it + 4, new, kp

        _, kp, _ = lax.while_loop(
            cond, step, (jnp.int32(0), valid_f, jnp.zeros_like(valid_f)))
        keeps.append(kp)
        o_ref[0, 0, ti * T:(ti + 1) * T] = kp[0]


def _suppress_call_tiled(obt, obc, sct, scc, *, iou_thres, interpret,
                         tile=512):
    """Pad k to a multiple of `tile` (zero-area invalid candidates are
    inert) and run the blocked kernel, one image per program."""
    b, _, k = obt.shape
    kp = (k + tile - 1) // tile * tile
    if kp != k:
        obt = jnp.pad(obt, ((0, 0), (0, 0), (0, kp - k)))
        obc = jnp.pad(obc, ((0, 0), (0, kp - k), (0, 0)))
        sct = jnp.pad(sct, ((0, 0), (0, 0), (0, kp - k)),
                      constant_values=-1.0)
        scc = jnp.pad(scc, ((0, 0), (0, kp - k), (0, 0)),
                      constant_values=-1.0)
    kern = functools.partial(_suppress_kernel_tiled, iou_thres=iou_thres,
                             tile=tile, nblocks=kp // tile)
    keep_f = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 4, kp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, kp, 4), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, kp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, kp, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, kp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, kp), jnp.float32),
        interpret=interpret,
    )(obt, obc, sct, scc)
    return keep_f[:, :, :k]


def keep_mask_batch(boxes_k, score_k, cls_k, valid_k, *, iou_thres,
                    interpret: bool = False):
    """Greedy-NMS keep mask (B,k) bool for rank-ordered candidates —
    the Pallas stage of `suppress_ranked_batch`, exposed separately for
    the perf-diagnostic hook (tools/pp_breakdown.py)."""
    b, k = score_k.shape
    off = (cls_k.astype(boxes_k.dtype) * _MAX_WH)[..., None]
    obc = boxes_k + off                                   # (B,k,4)
    obt = obc.transpose(0, 2, 1)                          # (B,4,k)
    # the kernel reads these operands only through `> 0` validity tests
    # (ranking is positional: rows are pre-sorted), so validity is
    # encoded explicitly as ±1 — valid_k is authoritative even for a
    # valid candidate whose score is ≤ 0, exactly like suppress_ranked
    sc = jnp.where(valid_k, 1.0, -1.0).astype(jnp.float32)
    sct = sc[:, None, :]                                  # (B,1,k)
    scc = sc[..., None]                                   # (B,k,1)

    if k > 512:
        # one (k,k) matrix would outgrow scoped VMEM: blocked kernel,
        # (T,T) tiles of the overlap matrix (eval-grade windows, VERDICT
        # r2 #6).  T=512 keeps the per-program stack ≈5× under the 16 MB
        # scoped-VMEM limit of v5e-lite — T=1024 (4 MB tiles and several
        # live iou temporaries) measured 16.7 MB and faulted the compile
        # on real hardware (r4 eval-CLI OOM).
        keep_f = _suppress_call_tiled(obt, obc, sct, scc,
                                      iou_thres=iou_thres,
                                      interpret=interpret)
    else:
        # VMEM: ~2 live (k,k) f32 matrices per image; keep the group's
        # working set ≲8 MB (k=256 → group 8; k=1024 → group 1)
        max_group = max(1, (8 << 20) // (k * k * 8))
        group = 1
        while (b % (group * 2) == 0) and group * 2 <= min(8, max_group):
            group *= 2
        kern = functools.partial(_suppress_kernel, iou_thres=iou_thres,
                                 group=group)
        keep_f = pl.pallas_call(
            kern,
            grid=(b // group,),
            in_specs=[pl.BlockSpec((group, 4, k), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((group, k, 4), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((group, 1, k), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((group, k, 1), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((group, 1, k), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.float32),
            interpret=interpret,
        )(obt, obc, sct, scc)
    return keep_f[:, 0, :] > 0.5                          # (B,k)


def compact_ranked(keep, boxes_k, score_k, cls_k, *, max_det):
    """Kept rows to the front IN RANK ORDER via one small sort on the
    integer key (rank | k+rank) — distinct keys, so the result is
    exactly suppress_ranked's scatter compaction, but without the XLA
    scatter (measured 1.49 µs/img of the serving path's 5.0 µs
    postprocess at b128/k256 — tools/pp_breakdown.py; the k-lane
    7-operand sort is ~0.1 µs).

    keep (B,k) bool, boxes_k (B,k,4), score_k (B,k), cls_k (B,k) int
    → ((B,max_det,6) rows [xyxy, conf, cls], (B,) counts)."""
    b, k = score_k.shape
    n_keep = jnp.minimum(jnp.sum(keep, axis=1), max_det)
    rank = lax.broadcasted_iota(jnp.int32, (b, k), 1)
    key = jnp.where(keep, rank, k + rank)
    _, b0, b1, b2, b3, sc_s, cl_s = lax.sort(
        (key, boxes_k[..., 0], boxes_k[..., 1], boxes_k[..., 2],
         boxes_k[..., 3], score_k, cls_k.astype(boxes_k.dtype)),
        dimension=1, is_stable=False, num_keys=1)
    rows = jnp.stack([b0, b1, b2, b3, sc_s, cl_s], axis=-1)  # (B,k,6)
    if k < max_det:
        rows = jnp.pad(rows, ((0, 0), (0, max_det - k), (0, 0)))
    live = (lax.broadcasted_iota(jnp.int32, (b, max_det), 1)
            < n_keep[:, None])
    det = jnp.where(live[..., None], rows[:, :max_det], 0)
    return det, n_keep


def suppress_ranked_batch(boxes_k, score_k, cls_k, valid_k, *, iou_thres,
                          max_det, interpret: bool = False):
    """Batched greedy suppression: Pallas keep-mask + XLA compaction.

    boxes_k (B,k,4) xyxy, score_k (B,k) descending, cls_k (B,k) int,
    valid_k (B,k) bool → ((B,max_det,6), (B,) counts); exactly
    ``jax.vmap(suppress_ranked)`` (pinned by test)."""
    keep = keep_mask_batch(boxes_k, score_k, cls_k, valid_k,
                           iou_thres=iou_thres, interpret=interpret)
    return compact_ranked(keep, boxes_k, score_k, cls_k, max_det=max_det)
