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
        b_idx = jax.lax.broadcasted_iota(jnp.int32, (bm, mm, aa, oo), 0)
        a_idx = jax.lax.broadcasted_iota(jnp.int32, (bm, mm, aa, oo), 2)
        maskf = t.mask.astype(jnp.float32)

        # ---- reg (CIoU) ----
        reg5 = reg.reshape(b, h, w, a, 4)
        ps = reg5[b_idx, t.gj, t.gi, a_idx]                 # (B,M,A,O,4)
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

        # ---- obj (BCE over the full grid) ----
        tobj = jnp.zeros((b, h, w, a), jnp.float32)
        tobj = tobj.at[b_idx, t.gj, t.gi, a_idx].max(maskf)
        lobj = lobj + jnp.mean(_bce_logits(obj, tobj)) * _BALANCE[s]

        # ---- cls (softmax CE at matched cells; skipped when nc==1,
        # matching the reference's ps.size(1) > 1 guard) ----
        if nc > 1:
            psc = cls[b_idx, t.gj, t.gi]                    # (B,M,A,O,nc)
            logp = jax.nn.log_softmax(psc, axis=-1)
            ce = -jnp.take_along_axis(
                logp, t.tcls[:, :, None, None, None].astype(jnp.int32),
                axis=-1)[..., 0]
            lcls = lcls + _masked_mean(ce, maskf) / nc

    lbox = lbox * 3.2
    lobj = lobj * 64.0
    lcls = lcls * 32.0
    total = lbox + lobj + lcls
    return total, {"box": lbox, "obj": lobj, "cls": lcls, "total": total}
