"""Fused rank→decode→NMS serving kernel: sort payloads replaced by
in-VMEM MXU gathers, box decode and greedy suppression in ONE program.

Motivation (tools/pp_breakdown.py, 1× v5e, b128/k256): the postprocess
tail of the fused detect path costs ~3.5 µs/img — ranking sort ~1.8,
XLA box decode ~1.0-1.3, NMS keep ~0.8 — all latency-bound small-op
work (the whole tail moves ~225 KB/img; its HBM roof is 0.28 µs).  Two
structural costs this kernel removes:

  * the ranking `lax.sort` carried the 4 raw reg logits as payload
    operands (6-operand form, fastdet/ops/postprocess.py) because
    post-sort XLA gathers measured +2.9-3.6 µs/img.  A one-hot matmul
    on the MXU is a gather XLA cannot express: sort only 2 operands
    (key + packed index·classes+class), then gather the reg rows
    in-kernel as `regs(4,N) @ onehot(k,N)ᵀ` — bitwise-exact, because an
    f32 `dot_general` at `precision=HIGHEST` (3-term bf16 split, each
    term residual ≤2⁻⁹ rel., so 3 terms bound the error below 0.5 ULP)
    reproduces every gathered f32 bit-for-bit (probed on hardware over
    a 40-binade magnitude sweep);
  * the decode (sigmoid, ×2−0.5 + cell, (×2)² × anchor — the
    utils/utils.py:330-337 math) ran as ~15 small XLA ops between the
    sort and the NMS kernel, each a fusion/launch boundary at (B,256)
    shapes.  In-kernel `jax.nn.sigmoid` is bitwise-identical to XLA's
    (probed: 0/65536 mismatches incl. ±0, denormals, saturation), so
    the decode moves inside with exact parity.

Cell/stride/anchor geometry is a pure function of the flat candidate
index, so it rides a (8, N) TABLE built once per program from iotas
(B-independent) and gathered through the same one-hot — no integer
div/mod in the kernel beyond `idx = floor((combo+0.5)/nc)`, which is
exact in f32 for combo < 2²³ (the +0.5 keeps the true value ≥ 1/(2nc)
away from every integer boundary; beyond 2²³, combo+0.5 itself rounds
ties-to-even and an odd combo with cls=nc−1 lands on the wrong side).
The dispatcher in fastdet/ops/postprocess.py guards the fused branch
with `n·nc < 2²³`.

The suppression fixpoint and its exactness argument are unchanged from
fastdet/kernels/nms_kernel.py (reference: utils/utils.py:232-296 with
the class-offset trick; ncnn nmsHandle sample/ncnn/src/yolo-fastestv2
.cpp:78-110).  Both box orientations the (k,k) IoU build needs come
from one in-kernel transpose instead of duplicated HBM operands.

Serving windows only (k ≤ 384, one (k,k) tile in VMEM — k=512 measured
16.2 MB of scoped VMEM even at group 1, over the v5e 16 MB limit);
wider windows (512 … max_nms 2048) keep the staged/blocked-kernel paths
in fastdet/ops/postprocess.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_WH = 4096.0  # class-offset multiplier (reference utils/utils.py:240)


def _fused_kernel(s2_ref, regs_ref, geo_ref, keep_ref, boxes_ref, *,
                  nc: int, iou_thres: float, group: int):
    """`group` images per program.

    s2 (g, 2, k) f32: rows [−score (sorted ascending), combo=idx·nc+cls
    as f32]; regs (g, 4, Np) f32 raw reg logits, UNSORTED, lane = flat
    candidate index; geo (8, Np) f32 rows [cx, cy, stride, aw, ah, ·]
    → keep (g, 1, k) f32 0/1, boxes (g, 4, k) f32 xyxy (real coords).
    """
    k = s2_ref.shape[-1]
    npad = regs_ref.shape[-1]
    lane_i = lax.broadcasted_iota(jnp.int32, (k, k), 1)
    sub_j = lax.broadcasted_iota(jnp.int32, (k, k), 0)
    tri = sub_j < lane_i
    # Mosaic's tpu.iota only produces integer vectors — an f32 iota fails
    # verification on hardware.  int32 iota + astype compiles and is
    # bit-identical (values < 2^24).
    iota_n = lax.broadcasted_iota(jnp.int32, (1, npad), 1).astype(jnp.float32)
    geo = geo_ref[...]

    overlaps, valids = [], []
    for g in range(group):
        neg = s2_ref[g, 0:1, :]                     # (1,k)
        comb = s2_ref[g, 1:2, :]                    # (1,k) f32, exact int
        idx = jnp.floor((comb + 0.5) * (1.0 / nc))  # (1,k) exact
        cls = comb - nc * idx                       # (1,k) exact
        # one-hot gather: candidate row i selects flat index idx[i]
        oh = (idx.T == iota_n).astype(jnp.float32)  # (k, Np)
        regk = lax.dot_general(regs_ref[g], oh, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=lax.Precision.HIGHEST)  # (4,k)
        geok = lax.dot_general(geo, oh, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=lax.Precision.HIGHEST)  # (8,k)
        # decode — op-for-op the utils/utils.py:330-337 math as written
        # in fastdet/ops/postprocess.py (bitwise parity pinned by test)
        sig = jax.nn.sigmoid(regk)                  # (4,k)
        strd = geok[2:3]
        x = (sig[0:1] * 2.0 - 0.5 + geok[0:1]) * strd
        y = (sig[1:2] * 2.0 - 0.5 + geok[1:2]) * strd
        tw = sig[2:3] * 2.0
        th = sig[3:4] * 2.0
        w = tw * tw * geok[3:4]
        h = th * th * geok[4:5]
        x1, y1 = x - w / 2, y - h / 2
        x2, y2 = x + w / 2, y + h / 2
        boxes = jnp.concatenate([x1, y1, x2, y2], 0)        # (4,k)
        boxes_ref[g] = boxes
        obt = boxes + cls * _MAX_WH                         # (4,k)
        obc = obt.T                                         # (k,4)

        x1r, y1r, x2r, y2r = obt[0:1], obt[1:2], obt[2:3], obt[3:4]
        x1c, y1c = obc[:, 0:1], obc[:, 1:2]
        x2c, y2c = obc[:, 2:3], obc[:, 3:4]
        inter = (jnp.clip(jnp.minimum(x2r, x2c) - jnp.maximum(x1r, x1c), 0)
                 * jnp.clip(jnp.minimum(y2r, y2c) - jnp.maximum(y1r, y1c),
                            0))
        area_i = (x2r - x1r) * (y2r - y1r)
        area_j = (x2c - x1c) * (y2c - y1c)
        iou = inter / (area_i + area_j - inter + 1e-9)
        valid_row = jnp.where(neg < 0, 1.0, 0.0)            # (1,k)
        valid_col = valid_row.T                             # (k,1)
        overlaps.append(jnp.where((iou > iou_thres) & tri
                                  & (valid_col > 0.0), 1.0, 0.0))
        valids.append(valid_row)

    valid_f = jnp.concatenate(valids, 0)                    # (g,k)

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
        keep_ref[g] = keep[g:g + 1]


def rank_decode_nms(neg_k, combo_k, regs_lane, geo, *, nc: int,
                    iou_thres: float, interpret: bool = False):
    """neg_k (B,k) f32 ascending sort keys (−score), combo_k (B,k) i32,
    regs_lane (B,4,Np) f32 unsorted, geo (8,Np) f32
    → (keep (B,k) bool, boxes (B,k,4) f32 xyxy)."""
    b, k = neg_k.shape
    npad = regs_lane.shape[-1]
    s2 = jnp.stack([neg_k, combo_k.astype(jnp.float32)], axis=1)  # (B,2,k)

    # VMEM/image ≈ onehot (k·Np) + overlap (k²) + several live (k,k)
    # iou temporaries; Mosaic's stack allocator is conservative, so the
    # budget is empirical: k=512 at group 2 measured 18.14 MB of scoped
    # stack on v5e (>16 MB limit, hardware compile failure caught by
    # tools/tpu_smoke.py) while k=256 at group 4 fits.  Group caps by
    # k, validated on the chip: ≤256 → 4, 384 → 2, 512 → 1.
    max_group = 4 if k <= 256 else (2 if k <= 384 else 1)
    group = 1
    while (b % (group * 2) == 0) and group * 2 <= max_group:
        group *= 2
    kern = functools.partial(_fused_kernel, nc=nc, iou_thres=iou_thres,
                             group=group)
    keep_f, boxes = pl.pallas_call(
        kern,
        grid=(b // group,),
        in_specs=[pl.BlockSpec((group, 2, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((group, 4, npad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((group, 1, k), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((group, 4, k), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((b, 1, k), jnp.float32),
                   jax.ShapeDtypeStruct((b, 4, k), jnp.float32)],
        interpret=interpret,
    )(s2, regs_lane, geo)
    return keep_f[:, 0, :] > 0.5, boxes.transpose(0, 2, 1)
