"""Dense, static-shape anchor matching (the XLA answer to build_target).

The reference builds variable-length index lists with boolean-mask gathers
(/root/reference/utils/loss.py:53-124: per-anchor wh-ratio match < 2,
then neighbor-cell expansion with g=0.5 over a 5-offset table).  That is
dynamic-shape and unusable under jit.  Here every ground-truth box in a
fixed (B, M) padded label tensor generates A·5 candidate assignments with
a validity mask; downstream losses use masked reductions and scatters, so
semantics (including duplicate matches and last-write ties) are preserved
with fully static shapes.

Candidate tensor layout: (B, M, A, O) with O = 5 offsets
[center, left, top, right, bottom].
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

# neighbor-cell offset table, g = 0.5 (matches the reference's
# off = [[0,0],[1,0],[0,1],[-1,0],[0,-1]] * 0.5)
_OFFSETS = np.array([[0.0, 0.0], [0.5, 0.0], [0.0, 0.5],
                     [-0.5, 0.0], [0.0, -0.5]], np.float32)


class DenseTargets(NamedTuple):
    """Per-scale static-shape assignment candidates."""
    gi: jnp.ndarray      # (B,M,A,O) int32 grid x index, clipped in-bounds
    gj: jnp.ndarray      # (B,M,A,O) int32 grid y index, clipped in-bounds
    tbox: jnp.ndarray    # (B,M,A,O,4) regression target (dx, dy, gw, gh)
    anchors: jnp.ndarray # (A,2) anchor sizes in grid units
    tcls: jnp.ndarray    # (B,M) int32 class id
    mask: jnp.ndarray    # (B,M,A,O) bool — candidate validity


def pack_labels(label_list: Sequence[np.ndarray], max_labels: int
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Pack per-image label arrays (n_i, 5) [cls,cx,cy,w,h] into a
    fixed-shape (B, max_labels, 5) tensor + (B, max_labels) mask."""
    b = len(label_list)
    out = np.zeros((b, max_labels, 5), np.float32)
    mask = np.zeros((b, max_labels), bool)
    for i, lab in enumerate(label_list):
        lab = np.asarray(lab, np.float32).reshape(-1, 5)
        n = min(len(lab), max_labels)
        out[i, :n] = lab[:n]
        mask[i, :n] = True
    return out, mask


def build_dense_targets(labels: jnp.ndarray, label_mask: jnp.ndarray,
                        anchors_grid: jnp.ndarray,
                        grid_hw: Tuple[int, int]) -> DenseTargets:
    """Build candidates for ONE scale.

    labels: (B,M,5) [cls, cx, cy, w, h] normalized to [0,1]
    label_mask: (B,M) bool
    anchors_grid: (A,2) anchors in grid units (pixels / stride)
    grid_hw: (h, w) feature-map size
    """
    h, w = grid_hw
    a = anchors_grid.shape[0]
    b, m, _ = labels.shape

    cls_ = labels[..., 0].astype(jnp.int32)                  # (B,M)
    gxy = labels[..., 1:3] * jnp.asarray([w, h], jnp.float32)  # grid units
    gwh = labels[..., 3:5] * jnp.asarray([w, h], jnp.float32)

    # wh-ratio anchor match: max(r, 1/r).max < 2
    r = gwh[:, :, None, :] / anchors_grid[None, None]        # (B,M,A,2)
    ratio = jnp.maximum(r, 1.0 / r).max(-1)                  # (B,M,A)
    anchor_ok = ratio < 2.0

    # neighbor-cell masks (gx%1<g & gx>1 etc.)
    gx, gy = gxy[..., 0], gxy[..., 1]
    inv_x, inv_y = w - gx, h - gy
    j = (gx % 1.0 < 0.5) & (gx > 1.0)          # left neighbor
    k = (gy % 1.0 < 0.5) & (gy > 1.0)          # top neighbor
    l = (inv_x % 1.0 < 0.5) & (inv_x > 1.0)    # right neighbor
    m_ = (inv_y % 1.0 < 0.5) & (inv_y > 1.0)   # bottom neighbor
    off_ok = jnp.stack([jnp.ones_like(j), j, k, l, m_], axis=-1)  # (B,M,O)

    mask = (label_mask[:, :, None, None]
            & anchor_ok[:, :, :, None]
            & off_ok[:, :, None, :])                         # (B,M,A,O)

    offs = jnp.asarray(_OFFSETS)                             # (O,2)
    # candidate cell = floor(gxy - offset), clipped in-bounds (the
    # reference clamps in place so its tbox also sees clipped cells)
    cand_xy = gxy[:, :, None, :] - offs[None, None]          # (B,M,O,2)
    gij = jnp.floor(cand_xy).astype(jnp.int32)
    gi = jnp.clip(gij[..., 0], 0, w - 1)                     # (B,M,O)
    gj = jnp.clip(gij[..., 1], 0, h - 1)

    dxy = gxy[:, :, None, :] - jnp.stack([gi, gj], -1).astype(jnp.float32)
    tbox = jnp.concatenate(
        [dxy, jnp.broadcast_to(gwh[:, :, None, :], dxy.shape)], axis=-1)

    # broadcast offset-axis quantities over the anchor axis
    gi = jnp.broadcast_to(gi[:, :, None, :], (b, m, a, 5))
    gj = jnp.broadcast_to(gj[:, :, None, :], (b, m, a, 5))
    tbox = jnp.broadcast_to(tbox[:, :, None, :, :], (b, m, a, 5, 4))

    return DenseTargets(gi=gi, gj=gj, tbox=tbox, anchors=anchors_grid,
                        tcls=cls_, mask=mask)
