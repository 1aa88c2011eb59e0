"""Detection loss — dense static-shape XLA version.

Numeric parity with the reference (/root/reference/utils/loss.py:130-208):
  * reg: decode pxy = σ·2−0.5, pwh = (σ·2)²·anchor at every candidate,
    CIoU vs target, MEAN over matched candidates per scale
  * obj: BCE-with-logits against a 0/1 grid (1 where any candidate lands;
    duplicate writes collapse, matching tobj[b,a,gj,gi]=1), mean over the
    whole grid, per-scale balance [1.0, 0.4]
  * cls: softmax cross-entropy at matched cells (anchor axis collapsed —
    the same cell is counted once per matching (anchor, offset) row, as
    the reference does), mean over candidates, ÷ classes
  * total = 3.2·lbox + 64·lobj + 32·lcls

All gathers/scatters are over fixed (B, M, A, O) candidate tensors with
masked reductions, so the whole thing jits into one XLA program.

Gather/scatter-free formulation (round 4): XLA lowers `x.at[idx].max()`
and the VJP of advanced-index gathers to *serialized* per-update scatter
loops on TPU — measured at ~21 µs/img for targets+loss alone (b128),
2.7 ms/step, dwarfing the network forward.  Since the candidate count
(M·O = 40 cells/image) and the grids (≤22²·3 slots) are tiny, every
indexed access is instead expressed densely:

  * candidate-cell gathers  → one-hot (MO, HW) matmul against the
    flattened feature map — MXU work whose transpose (the VJP) is
    another matmul, not a scatter-add;
  * the tobj scatter-max    → a broadcast compare + any-reduce of
    packed (cell·A + a) keys against the grid's iota (no gradient
    flows through tobj, but the forward scatter itself serialized).

Both are numerically exact: the one-hot rows are exactly {0,1} so the
matmul reproduces the gathered values bit-for-bit (HIGHEST precision
pins the f32 dot), and the compare-reduce computes the same 0/1 grid
as last-write-wins scatter of ones.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from fastdet.ops.iou import bbox_ciou
from fastdet.train.targets import build_dense_targets

_BALANCE = (1.0, 0.4)


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    denom = jnp.sum(mask)
    return jnp.where(denom > 0, jnp.sum(x * mask) / jnp.maximum(denom, 1), 0.0)


def _bce_logits(x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross-entropy with logits (stable form)."""
    return jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))


def compute_loss(outputs: Sequence[jnp.ndarray], labels: jnp.ndarray,
                 label_mask: jnp.ndarray, anchors: jnp.ndarray,
                 input_hw: Tuple[int, int]
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """outputs: 6-tuple (reg2,obj2,cls2,reg3,obj3,cls3), NHWC raw logits.
    labels: (B,M,5) [cls,cx,cy,w,h] normalized; label_mask: (B,M) bool.
    anchors: (S,A,2) in input pixels.  Returns (total, components)."""
    num_scales = len(outputs) // 3
    lbox = jnp.float32(0.0)
    lobj = jnp.float32(0.0)
    lcls = jnp.float32(0.0)

    for s in range(num_scales):
        reg, obj, cls = (outputs[3 * s].astype(jnp.float32),
                         outputs[3 * s + 1].astype(jnp.float32),
                         outputs[3 * s + 2].astype(jnp.float32))
        b, h, w, _ = reg.shape
        a = obj.shape[-1]
        nc = cls.shape[-1]
        stride = input_hw[1] / w
        anchors_grid = anchors[s] / stride

        t = build_dense_targets(labels, label_mask, anchors_grid, (h, w))
        bm, mm, aa, oo = t.mask.shape
        maskf = t.mask.astype(jnp.float32)

        hw = h * w
        # candidate cells are anchor-invariant (gi/gj broadcast over A)
        gi0 = t.gi[:, :, 0, :]                              # (B,M,O)
        gj0 = t.gj[:, :, 0, :]
        cell = (gj0 * w + gi0).reshape(bm, mm * oo)         # (B, MO)
        onehot = (cell[:, :, None] == jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, hw), 2)).astype(jnp.float32)  # (B, MO, HW)

        def gather_cells(feat_flat):
            # exact gather as a batched one-hot matmul (rows are {0,1})
            return jax.lax.dot_general(
                onehot, feat_flat, (((2,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST)        # (B, MO, C)

        # ---- reg (CIoU) ----
        ps_mo = gather_cells(reg.reshape(b, hw, a * 4))
        ps = ps_mo.reshape(bm, mm, oo, a, 4).transpose(0, 1, 3, 2, 4)
        pxy = jax.nn.sigmoid(ps[..., :2]) * 2.0 - 0.5
        pwh = ((jax.nn.sigmoid(ps[..., 2:4]) * 2.0) ** 2
               * t.anchors[None, None, :, None, :])
        pbox = jnp.concatenate([pxy, pwh], axis=-1)
        # padded candidates have zero-size target boxes → CIoU would be
        # NaN (atan 0/0); substitute unit boxes where masked out
        safe = jnp.asarray([0.0, 0.0, 1.0, 1.0])
        tbox = jnp.where(t.mask[..., None], t.tbox, safe)
        ciou = bbox_ciou(pbox, tbox)
        lbox = lbox + _masked_mean(1.0 - ciou, maskf)

        # ---- obj (BCE over the full grid): the 0/1 target grid as a
        # packed-key compare + any-reduce (≡ scatter-max of maskf) ----
        a_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, aa, 1), 2)
        key = jnp.where(t.mask, (t.gj * w + t.gi) * a + a_iota, -1)
        key = key.reshape(bm, mm * aa * oo)                 # (B, MAO)
        tobj = (key[:, :, None] == jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, hw * a), 2)).any(axis=1)      # (B, HW·A)
        tobj = tobj.reshape(b, h, w, a).astype(jnp.float32)
        lobj = lobj + jnp.mean(_bce_logits(obj, tobj)) * _BALANCE[s]

        # ---- cls (softmax CE at matched cells; skipped when nc==1,
        # matching the reference's ps.size(1) > 1 guard).  The CE value
        # is anchor-independent; the anchor axis only weights the mean,
        # so candidates reduce as (B,M,O) with per-anchor mask counts ----
        if nc > 1:
            psc_mo = gather_cells(cls.reshape(b, hw, nc))   # (B, MO, nc)
            logp = jax.nn.log_softmax(
                psc_mo.reshape(bm, mm, oo, nc), axis=-1)
            onehot_cls = (t.tcls[:, :, None, None] == jax.lax.
                          broadcasted_iota(jnp.int32, (1, 1, 1, nc), 3))
            ce_mo = -jnp.sum(logp * onehot_cls, axis=-1)    # (B,M,O)
            w_mo = maskf.sum(axis=2)                        # anchors/cand
            denom = jnp.sum(maskf)
            lcls = lcls + jnp.where(
                denom > 0,
                jnp.sum(ce_mo * w_mo) / jnp.maximum(denom, 1), 0.0) / nc

    lbox = lbox * 3.2
    lobj = lobj * 64.0
    lcls = lcls * 32.0
    total = lbox + lobj + lcls
    return total, {"box": lbox, "obj": lobj, "cls": lcls, "total": total}
