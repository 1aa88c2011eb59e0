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
both scores likewise; 8 KB/image of duplicated input buys a
transpose-free kernel.
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
    """`group` images per program: off_boxes (g,4,k)+(g,k,4), scores
    (g,1,k)+(g,k,1) → keep (g,1,k).  lanes index candidate i, sublanes
    index suppressor j.  The group amortizes per-program launch
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


def suppress_ranked_batch(boxes_k, score_k, cls_k, valid_k, *, iou_thres,
                          max_det, interpret: bool = False):
    """Batched greedy suppression: Pallas keep-mask + XLA compaction.

    boxes_k (B,k,4) xyxy, score_k (B,k) descending, cls_k (B,k) int,
    valid_k (B,k) bool → ((B,max_det,6), (B,) counts); exactly
    ``jax.vmap(suppress_ranked)`` (pinned by test)."""
    b, k = score_k.shape
    off = (cls_k.astype(boxes_k.dtype) * _MAX_WH)[..., None]
    obc = boxes_k + off                                   # (B,k,4)
    obt = obc.transpose(0, 2, 1)                          # (B,4,k)
    sc = jnp.where(valid_k, score_k, -1.0)
    sct = sc[:, None, :]                                  # (B,1,k)
    scc = sc[..., None]                                   # (B,k,1)

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
    keep = keep_f[:, 0, :] > 0.5                          # (B,k)

    # compaction (same as suppress_ranked's tail, batch-vectorized)
    kept_rank = jnp.where(keep, jnp.cumsum(keep, axis=1) - 1, k + max_det)
    n_keep = jnp.minimum(jnp.sum(keep, axis=1), max_det)
    rows = jnp.concatenate(
        [boxes_k, score_k[..., None], cls_k.astype(boxes_k.dtype)[..., None]],
        axis=-1)
    det = jnp.zeros((b, max_det, 6), boxes_k.dtype).at[
        jnp.arange(b)[:, None], kept_rank].set(rows, mode="drop")
    return det, n_keep
