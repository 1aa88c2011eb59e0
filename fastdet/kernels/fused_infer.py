"""Fused Pallas inference path: VMEM-resident block spans.

The XLA forward materializes every intermediate activation tensor in HBM
(each ShuffleV2 block writes ~6 tensors), which makes this tiny,
dw-conv-heavy network bandwidth-bound.  Here the stride-1 block spans of
each backbone stage and the whole FPN+head pyramid run as per-image
Pallas kernels: activations stay in VMEM across blocks, pointwise convs
and the folded channel-shuffle/concat run on the MXU, and depthwise
convs are unrolled tap accumulations on the VPU.  Only stage boundaries
touch HBM.

In-kernel layout: activations are FLAT (H·W, C) — Mosaic cannot shape-
cast (h, w, c) → (h·w, c) for odd spatial sizes, so depthwise convs are
computed directly on the flat layout as shifted-slice taps with a
column-validity mask (a flat shift of (dy·W + dx) borrows pixels across
row boundaries exactly where src_col leaves [0, W); masking those lanes
reproduces zero padding).

Kept in XLA (cheap / awkward in Mosaic): the 3×3 s2 stem conv, maxpool,
the three stride-2 blocks, and the 2× nearest upsample + concat feeding
the FPN's fine scale.

Numeric contract: identical to `Detector.apply(..., train=False)` with
BN folded — validated against the linen model in tests.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastdet.kernels.fold import pack_fused_weights

_STAGES = ((2, 4, 48), (3, 8, 96), (4, 4, 192))  # (stage, repeats, channels)


# ---------------------------------------------------------------- kernels

def _matmul(x2, w, b):
    y = lax.dot_general(x2, w, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
    return y + b.astype(jnp.float32)


def _shift_flat(y, off, hw):
    """Shift a (HW, C) array by `off` rows, zero-filling (static off)."""
    if off == 0:
        return y
    if off > 0:
        return jnp.pad(y[off:], ((0, off), (0, 0)))
    return jnp.pad(y[:off], ((-off, 0), (0, 0)))


def _dw_conv_flat(y, wd, bd, h, w, k):
    """Depthwise k×k, pad k//2, stride 1, on FLAT (H·W, C)."""
    return _dw_conv_group(y, wd, bd, h, w, k, 1)


def _dw_conv_group(y, wd, bd, h, w, k, g):
    """Depthwise conv on (G·H·W, C) flat groups.  Flat shifts may borrow
    pixels across row AND image boundaries; the validity mask covers
    both: columns leaving [0, W) and rows leaving the image's row range
    (the latter only matters within k//2 rows of an image edge, where
    the row index modulo H wraps)."""
    p = k // 2
    ghw, c = y.shape
    hw = h * w
    idx = lax.broadcasted_iota(jnp.int32, (ghw, 1), 0)
    col = idx % w
    row = (idx // w) % h
    acc = jnp.zeros((ghw, c), jnp.float32)
    for dy in range(k):
        for dx in range(k):
            off = (dy - p) * w + (dx - p)
            sh = _shift_flat(y, off, ghw)
            mask = None
            if dx != p:
                mask = jnp.logical_and(col + (dx - p) >= 0,
                                       col + (dx - p) < w)
            if g > 1 and dy != p:
                rmask = jnp.logical_and(row + (dy - p) >= 0,
                                        row + (dy - p) < h)
                mask = rmask if mask is None else jnp.logical_and(mask, rmask)
            if mask is not None:
                sh = jnp.where(mask, sh, 0)
            acc = acc + (sh * wd[dy, dx]).astype(jnp.float32)
    return acc + bd.astype(jnp.float32)


def _s1_span_kernel(x_ref, *refs, n_blocks: int, h: int, w: int, c: int,
                    g: int, dtype):
    """n stride-1 ShuffleV2 blocks, activations resident in VMEM.

    Per block the weight refs are (w1, b1, wd, bd, w2, b2, p_pass,
    p_main); the final ref is the output.  x_ref block: (G, H·W, C) — a
    group of G images per program amortizes per-program overhead; the
    flat spatial axis is per-image, so group members never mix (shifts
    operate on axis 1 only)."""
    o_ref = refs[-1]
    wrefs = refs[:-1]
    for gi in range(g):
        x2 = x_ref[gi]
        for i in range(n_blocks):
            w1, b1, wd, bd, w2, b2, p_pass, p_main = wrefs[8 * i:8 * i + 8]
            y = jnp.maximum(_matmul(x2, w1[...], b1[...]), 0.0).astype(dtype)
            acc = _dw_conv_flat(y, wd[...], bd[...], h, w, 3).astype(dtype)
            z = jnp.maximum(_matmul(acc, w2[...], b2[...]), 0.0).astype(dtype)
            x2 = (_matmul(x2, p_pass[...], jnp.zeros((1,), dtype))
                  + lax.dot_general(z, p_main[...], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                  ).astype(dtype)
        o_ref[gi] = x2


def _dwconvblock_flat(s, wb: Dict[str, Any], h: int, w: int, dtype):
    """Head DWConvBlock on flat layout: dw5+ReLU → pw → dw5+ReLU → pw."""
    y = jnp.maximum(_dw_conv_flat(s, wb["dw1_w"][...], wb["dw1_b"][...],
                                  h, w, 5), 0.0).astype(dtype)
    y = _matmul(y, wb["pw1_w"][...], wb["pw1_b"][...]).astype(dtype)
    y = jnp.maximum(_dw_conv_flat(y, wb["dw2_w"][...], wb["dw2_b"][...],
                                  h, w, 5), 0.0).astype(dtype)
    y = _matmul(y, wb["pw2_w"][...], wb["pw2_b"][...]).astype(dtype)
    return y


def _fpn_scale_kernel(x_ref, *refs, h: int, w: int, cin: int, cdepth: int,
                      g: int, dtype):
    """One FPN scale + shared output heads, fused.  x_ref: (G, H·W, Cin);
    outputs (G, H·W, 4A/A/classes)."""
    (c1w, c1b,
     cd1w, cd1b, cp1w, cp1b, cd2w, cd2b, cp2w, cp2b,
     rd1w, rd1b, rp1w, rp1b, rd2w, rd2b, rp2w, rp2b,
     hrw, hrb, how, hob, hcw, hcb,
     reg_ref, obj_ref, cls_ref) = refs

    cls_wb = {"dw1_w": cd1w, "dw1_b": cd1b, "pw1_w": cp1w, "pw1_b": cp1b,
              "dw2_w": cd2w, "dw2_b": cd2b, "pw2_w": cp2w, "pw2_b": cp2b}
    reg_wb = {"dw1_w": rd1w, "dw1_b": rd1b, "pw1_w": rp1w, "pw1_b": rp1b,
              "dw2_w": rd2w, "dw2_b": rd2b, "pw2_w": rp2w, "pw2_b": rp2b}

    for gi in range(g):
        s = jnp.maximum(_matmul(x_ref[gi], c1w[...], c1b[...]),
                        0.0).astype(dtype)
        cls_feat = _dwconvblock_flat(s, cls_wb, h, w, dtype)
        reg_feat = _dwconvblock_flat(s, reg_wb, h, w, dtype)
        reg_ref[gi] = _matmul(reg_feat, hrw[...], hrb[...])
        obj_ref[gi] = _matmul(cls_feat, how[...], hob[...])
        cls_ref[gi] = _matmul(cls_feat, hcw[...], hcb[...])


# ------------------------------------------------------------ XLA pieces

def _conv(x, w, stride, groups=1):
    return lax.conv_general_dilated(
        x, w, (stride, stride),
        [(w.shape[0] // 2,) * 2, (w.shape[1] // 2,) * 2],
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _s2_block_xla(x, p, prefix, cin, cout, dtype):
    """Stride-2 ShuffleV2 block in XLA with folded weights."""
    mid = cout // 2
    wd = p[f"{prefix}_wd"][:, :, None, :]          # (3,3,1,mid)
    wpd = p[f"{prefix}_wpd"][:, :, None, :]        # (3,3,1,cin)
    y = jnp.maximum(x @ p[f"{prefix}_w1"] + p[f"{prefix}_b1"], 0.0)
    y = _conv(y.astype(dtype), wd, 2, groups=mid) + p[f"{prefix}_bd"]
    y = jnp.maximum(y @ p[f"{prefix}_w2"] + p[f"{prefix}_b2"], 0.0)
    pr = _conv(x, wpd, 2, groups=cin) + p[f"{prefix}_bpd"]
    pr = jnp.maximum(pr @ p[f"{prefix}_wpp"] + p[f"{prefix}_bpp"], 0.0)
    return jnp.concatenate([pr, y], axis=-1).astype(dtype)


# ------------------------------------------------------------- builders

def _pick_group(b, hw, c, budget_bytes=6 * 1024 * 1024):
    """Largest divisor of b whose (G, HW, 128-padded C) bf16 working set
    (×2 for double buffering + intermediates) stays under budget."""
    lanes = ((c + 127) // 128) * 128
    per_img = hw * lanes * 2 * 4   # ~4 live tensors incl. in/out blocks
    g = max(1, budget_bytes // max(per_img, 1))
    while b % g:
        g -= 1
    return g


def _span_call(x, p, stage, n_blocks, h, w, c, dtype, interpret):
    """x: (B, H·W, C) flat."""
    names = ("w1", "b1", "wd", "bd", "w2", "b2", "p_pass", "p_main")
    weights = [p[f"s{stage}_{i}_{n}"] for i in range(1, n_blocks + 1)
               for n in names]
    b = x.shape[0]
    hw = h * w
    g = _pick_group(b, hw, c)
    kern = functools.partial(_s1_span_kernel, n_blocks=n_blocks, h=h, w=w,
                             c=c, g=g, dtype=dtype)
    return pl.pallas_call(
        kern,
        grid=(b // g,),
        in_specs=[pl.BlockSpec((g, hw, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights),
        out_specs=pl.BlockSpec((g, hw, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), dtype),
        interpret=interpret,
    )(x, *weights)


def _fpn_call(x, p, scale, h, w, cin, cdepth, anchor_num, classes, dtype,
              interpret):
    """x: (B, H·W, Cin) flat → three (B, H·W, ·) fp32 outputs."""
    s = scale
    weights = [p[f"conv1x1_{s}_w"], p[f"conv1x1_{s}_b"]]
    for head in (f"cls_head_{s}", f"reg_head_{s}"):
        for n in ("dw1_w", "dw1_b", "pw1_w", "pw1_b",
                  "dw2_w", "dw2_b", "pw2_w", "pw2_b"):
            weights.append(p[f"{head}_{n}"])
    for out in ("output_reg", "output_obj", "output_cls"):
        weights.append(p[f"{out}_w"])
        weights.append(p[f"{out}_b"])

    b = x.shape[0]
    hw = h * w
    g = _pick_group(b, hw, max(cin, classes))
    kern = functools.partial(_fpn_scale_kernel, h=h, w=w, cin=cin,
                             cdepth=cdepth, g=g, dtype=dtype)
    out_shapes = tuple(
        jax.ShapeDtypeStruct((b, hw, d), jnp.float32)
        for d in (4 * anchor_num, anchor_num, classes))
    out_specs = tuple(
        pl.BlockSpec((g, hw, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM)
        for d in (4 * anchor_num, anchor_num, classes))
    return pl.pallas_call(
        kern,
        grid=(b // g,),
        in_specs=[pl.BlockSpec((g, hw, cin), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights),
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(x, *weights)


def build_fused_forward(variables: dict,
                        input_hw: Tuple[int, int] = (352, 352),
                        anchor_num: int = 3, classes: int = 80,
                        dtype=jnp.bfloat16, interpret: bool = False):
    """Returns (forward_fn, packed_weights).

    forward_fn(images_u8_nhwc, packed) → raw-logit 6-tuple identical to
    Detector.apply(..., train=False).  `packed` must be passed through as
    a runtime argument (weights are never baked constants — see
    fastdet/ops/postprocess.py for the compiler pathology)."""
    packed = pack_fused_weights(variables)
    packed = {k: jnp.asarray(v, dtype) for k, v in packed.items()}
    ih, iw = input_hw
    h4, w4 = ih // 4, iw // 4          # after stem+pool

    def forward(images, p):
        x = images.astype(dtype) / jnp.asarray(255.0, dtype)
        x = _conv(x, p["stem_w"], 2) + p["stem_b"]
        x = jnp.maximum(x, 0.0).astype(dtype)
        x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
        h, w = h4, w4
        feats = {}
        cin = 24
        b = images.shape[0]
        for stage, reps, c in _STAGES:
            h, w = h // 2, w // 2
            x = _s2_block_xla(x, p, f"s{stage}_0", cin, c, dtype)
            x = x.reshape(b, h * w, c)
            x = _span_call(x, p, stage, reps - 1, h, w, c, dtype, interpret)
            feats[stage] = x
            x = x.reshape(b, h, w, c)
            cin = c

        h2 = w2 = h4 // 4
        h3 = w3 = h4 // 8
        C2 = feats[3]                                  # (B, h2·w2, 96)
        C3 = x                                         # (B, h3, w3, 192) NHWC
        reg3, obj3, cls3 = _fpn_call(feats[4], p, 3, h3, w3, 192, 72,
                                     anchor_num, classes, dtype, interpret)
        up = jnp.repeat(jnp.repeat(C3, 2, axis=1), 2, axis=2)
        P2 = jnp.concatenate([up, C2.reshape(b, h2, w2, 96)], axis=-1)
        reg2, obj2, cls2 = _fpn_call(P2.reshape(b, h2 * w2, 288), p, 2,
                                     h2, w2, 288, 72, anchor_num, classes,
                                     dtype, interpret)

        def unflat(t, h_, w_):
            return t.reshape(b, h_, w_, t.shape[-1])
        return (unflat(reg2, h2, w2), unflat(obj2, h2, w2),
                unflat(cls2, h2, w2), unflat(reg3, h3, w3),
                unflat(obj3, h3, w3), unflat(cls3, h3, w3))

    return forward, packed
