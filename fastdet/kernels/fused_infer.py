"""Fused Pallas inference path: transposed lane-packed backbone spans.

Design (round 2; replaces the round-1 flat (H·W, C) layout, which lost
to XLA — 49 vs 29 µs/img end-to-end, b256 bf16):

  * **Transposed (C, N) layout.**  Channels live on sublanes, the padded
    per-image spatial extent on lanes, G images side by side
    (N = G·pad128(H·W)).  The tiny channel counts of this net (24–96)
    waste lanes in a (H·W, C) layout; transposed, every lane is busy and
    matmul N is thousands wide.
  * **dw3×3 ∘ pw2 composed into one MXU matmul.**  The reference has no
    ReLU between the depthwise conv and the second pointwise
    (/root/reference/model/backbone/shufflenetv2.py:25-32), so they fold
    exactly into a single 3×3 full conv: z = Wc @ taps(y) with
    K = 9·C/2 — deep-K MXU work instead of VPU tap accumulation.
  * **bf16 lane rolls via f32 bitcast pairs.**  The 9 spatial taps are
    lane rolls; Mosaic only rotates 32-bit data, but a bf16 (2r, 2r+1)
    sublane pair bitcasts to one f32 row, rolls, and bitcasts back —
    half the VPU move volume of rolling f32 activations.
  * Cross-image/row/edge validity is a per-tap lane mask (a roll that
    crosses an image's row or the image boundary is zeroed).
  * **Fused stem** (conv3×3 s2 + ReLU + maxpool3×3 s2 in one kernel)
    when the input arrives in the s2d(4) uint8 host layout — see the
    stem section below.  From NHWC device input the stem stays in XLA
    (the device-side relayout costs more than the kernel saves).
  * Stride-2 blocks, FPN and heads stay in XLA: stride-2 spatial
    subsampling has no efficient lane addressing in Mosaic, and XLA
    already runs the small FPN/head convs near-optimally (~2.7 µs/img
    measured).

Measured (1× v5e, b256 bf16, carried-sum chain harness): forward
(s2d stem path) ≈16 µs/img; full detect (with top-k postprocess + the
Pallas NMS kernel) ≈26 µs/img → 37.5–37.9k img/s/chip.  (Round-2
baseline for reference: spans alone beat plain XLA 40.6 vs 44.2 µs/img
end-to-end before the stem/postprocess work.)

Numeric contract: identical to `Detector.apply(..., train=False)` with
BN folded — validated in tests (f32 interpret mode ≤2e-4; bf16 on
hardware within bf16 noise of the bf16 linen model).
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

from fastdet.kernels.fold import (pack_fused_weights,
                                  pack_fused_weights_af)

# (stage id, repeats, channels); spatial H=W = input/8, /16, /32
_STAGES = ((2, 4, 48), (3, 8, 96), (4, 4, 192))
# max lanes per span program by channel count (measured VMEM limits on
# v5e: the composed-matmul tap stack scales with C·N; beyond these the
# Mosaic scoped-vmem allocator overflows)
_LANE_BUDGET = {48: 8192, 96: 8192, 192: 2048}
# the fused stride-2 prologue holds a (4·cin, N) input block + both
# branch accumulators on top of the span working set
_LANE_BUDGET_S2 = {48: 8192, 96: 4096, 192: 2048}


def _pick_group(b: int, nimg: int, c: int, budgets=None) -> int:
    """Largest power-of-2 divisor of b with g·nimg within the lane
    budget (at 352² this lands on the measured sweet spots 4/16/16)."""
    budget = (budgets or _LANE_BUDGET).get(c, 4096)
    g = 1
    while (b % (g * 2) == 0) and (g * 2 * nimg <= budget):
        g *= 2
    return g


# ---------------------------------------------------------------- kernel

def _mm(a, b):
    return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _lane_geom(n: int, nimg: int, w: int):
    """Per-lane (col, row) of the packed per-image grid (G images of
    `nimg` lanes side by side)."""
    lane = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    li = lane % nimg
    return li % w, li // w


def _span_blocks(x, wrefs, nblk, h, w, nimg, mid, dtype):
    """`nblk` stride-1 ShuffleV2 blocks on a (C, N) register tile.

    Per block: one merged (C,C) matmul (pw1+odd-select on top, even
    passthrough below), 9 masked lane-rolls of the ReLU'd main branch,
    one composed (C/2, 9·C/2) matmul, row-concat.  N = G·nimg lanes,
    G images side by side; masks keep rolls from borrowing across rows,
    images, or padding."""
    n = x.shape[-1]
    col, row = _lane_geom(n, nimg, w)
    valid = []
    for t in range(9):
        dy, dx = t // 3 - 1, t % 3 - 1
        valid.append((col + dx >= 0) & (col + dx < w)
                     & (row + dy >= 0) & (row + dy < h))

    packed_rolls = dtype == jnp.bfloat16
    for i in range(nblk):
        wa, ba, wc, bc = wrefs[4 * i:4 * i + 4]
        a = _mm(wa[...], x) + ba[...][:, None]
        y = jnp.maximum(a[:mid], 0.)
        xe = a[mid:].astype(dtype)
        if packed_rolls:
            # roll bf16 via f32 sublane pairs (Mosaic rolls need 32-bit)
            ypk = pltpu.bitcast(y.astype(dtype), jnp.float32)
        else:
            ypk = y
        taps = []
        for t in range(9):
            dy, dx = t // 3 - 1, t % 3 - 1
            off = dy * w + dx
            sh = pltpu.roll(ypk, (-off) % n, 1)
            taps.append(jnp.where(valid[t], sh, 0.))
        ystack = jnp.concatenate(taps, 0)
        if packed_rolls:
            ystack = pltpu.bitcast(ystack, dtype)
        else:
            ystack = ystack.astype(dtype)
        z = jnp.maximum(_mm(wc[...], ystack) + bc[...][:, None],
                        0.).astype(dtype)
        x = jnp.concatenate([xe, z], 0)
    return x


def _span_kernel(x_ref, *refs, nblk: int, h: int, w: int, nimg: int,
                 mid: int, dtype):
    """`nblk` stride-1 ShuffleV2 blocks on a (1, C, N) VMEM block."""
    o_ref = refs[-1]
    o_ref[0] = _span_blocks(x_ref[0], refs[:-1], nblk, h, w, nimg, mid,
                            dtype)


def _s2_prologue(x, wa, ba, wc, bc, wp, bp, h, w, nimg, cin, mid, dtype):
    """Stride-2 ShuffleV2 block on PHASE-PACKED input, inside a kernel.

    x (4·cin, N): the stage input's four spatial phases
    p = (y%2)·2 + (x%2) stacked phase-major on sublanes; lanes are the
    stride-2 OUTPUT grid (h, w) — i.e. the span grid — G images side by
    side.  In this layout every stride-2 conv tap (dy,dx) reads phase
    (dy%2, dx%2) at a coarse lane roll of {-w,0} + {-1,0}: the s2d trick
    of the fused stem applied to the backbone's downsampling blocks
    (cites reference shufflenetv2.py:34-55 for the two branches).
    Both dw3×3(s2)∘pw compositions arrive pre-packed (fold.py
    `pack_s2_block_fused`) and run as ONE deep-K stacked matmul per
    branch, like the span blocks — 9 narrow accumulating matmuls were
    measured ~1.5 µs/img slower at stage 2 (MXU pipeline stalls on
    K=cin ops issued serially).

    Returns (2·mid, N) = concat[proj, main] on the (h, w) span grid.
    """
    n = x.shape[-1]
    col, row = _lane_geom(n, nimg, w)
    inb = row < h                       # pad-lane exclusion
    packed_rolls = dtype == jnp.bfloat16

    a = _mm(wa[...], x) + ba[...][:, None]        # (4·mid, N) f32
    y = jnp.maximum(a, 0.).astype(dtype)
    if packed_rolls:
        ypk = pltpu.bitcast(y, jnp.float32)
        xpk = pltpu.bitcast(x, jnp.float32)
        rs = 2                                     # f32 packs 2 bf16 rows
    else:
        ypk, xpk, rs = y, x, 1

    ytaps, xtaps = [], []
    for t in range(9):
        dy, dx = t // 3 - 1, t % 3 - 1
        p = (dy % 2) * 2 + (dx % 2)
        off = (-w if dy < 0 else 0) + (-1 if dx < 0 else 0)
        if off:
            mask = inb
            if dy < 0:
                mask = mask & (row >= 1)
            if dx < 0:
                mask = mask & (col >= 1)
        for src, csz, taps in ((ypk, mid, ytaps), (xpk, cin, xtaps)):
            pl_rows = csz // rs
            tap = src[p * pl_rows:(p + 1) * pl_rows]
            if off:
                tap = jnp.where(mask, pltpu.roll(tap, (-off) % n, 1), 0.)
            taps.append(tap)

    def unpack(taps):
        st = jnp.concatenate(taps, 0)
        return pltpu.bitcast(st, dtype) if packed_rolls else st.astype(dtype)

    z = _mm(wc[...], unpack(ytaps)) + bc[...][:, None]
    pr = _mm(wp[...], unpack(xtaps)) + bp[...][:, None]
    zact = jnp.maximum(z, 0.).astype(dtype)
    pact = jnp.maximum(pr, 0.).astype(dtype)
    return jnp.concatenate([pact, zact], 0)


def _s2span_kernel(x_ref, *refs, nblk: int, h: int, w: int, nimg: int,
                   cin: int, mid: int, dtype):
    """Stride-2 block (phase-packed prologue) + `nblk` span blocks in ONE
    program: (1, 4·cin, N) phase-packed stage input → (1, 2·mid, N) on
    the span grid.  Removes the NHWC round-trip + XLA stride-2 block at
    every stage boundary (docs/PERF.md: the relayouts were charging each
    stage ~1.5–4 µs/img that no roofline accounts for)."""
    o_ref = refs[-1]
    wrefs = refs[:-1]
    x = _s2_prologue(x_ref[0], *wrefs[:6], h, w, nimg, cin, mid, dtype)
    o_ref[0] = _span_blocks(x, wrefs[6:], nblk, h, w, nimg, mid, dtype)


def _span_call(xt, weights, nblk, h, w, nimg, c, dtype, interpret):
    n = xt.shape[-1]
    kern = functools.partial(_span_kernel, nblk=nblk, h=h, w=w, nimg=nimg,
                             mid=c // 2, dtype=dtype)
    return pl.pallas_call(
        kern,
        grid=(xt.shape[0],),
        in_specs=[pl.BlockSpec((1, c, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights),
        out_specs=pl.BlockSpec((1, c, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xt.shape, dtype),
        interpret=interpret,
    )(xt, *weights)


def _s2span_call(xp, weights, nblk, h, w, nimg, cin, c, dtype, interpret):
    """xp (B/g, 4·cin, N) phase-packed → (B/g, c, N) span-grid output."""
    n = xp.shape[-1]
    kern = functools.partial(_s2span_kernel, nblk=nblk, h=h, w=w,
                             nimg=nimg, cin=cin, mid=c // 2, dtype=dtype)
    return pl.pallas_call(
        kern,
        grid=(xp.shape[0],),
        in_specs=[pl.BlockSpec((1, 4 * cin, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weights),
        out_specs=pl.BlockSpec((1, c, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], c, n), dtype),
        interpret=interpret,
    )(xp, *weights)


# ----------------------------------------------------- fused stem kernel
#
# stem conv (3×3 s2, 3→24) + ReLU + maxpool (3×3 s2) in ONE kernel on a
# space-to-depth(4) uint8 input layout, via polyphase decomposition
# (cites reference shufflenetv2.py:74-80):
#
#   * **Input contract**: (B, 48, pad128(H/4·W/4)) uint8 — raw pixels in
#     s2d(4) channel-first order (channel = yoff·12 + xoff·3 + c, lanes
#     the (H/4, W/4) stride-4 grid).  The host writes this layout at
#     preprocess time (`pack_images_s2d`; native fd_preprocess_batch_s2d
#     — same byte count as NHWC, one extra repack pass ≈26% of host
#     preprocess); /255 normalization is folded into the conv weights,
#     so the device never touches the image before the kernel.
#   * conv: output row Y = 2i+py reads input row 4i + 2py+ky-1 =
#     4(i+du)+yoff with du∈{-1,0} — ALL FOUR conv phase planes
#     (py,px)∈{0,1}² are linear in the same 4 lane-rolled tap images
#     (du,dv)∈{-1,0}², and compute as ONE (96, 4·48)@(4·48, N) MXU
#     matmul (dense-K utilisation instead of a C=3 conv XLA pads to 128
#     lanes).  One u8→bf16 convert at (48,N); the 3 non-trivial tap
#     rolls ride f32 bitcast pairs.
#   * pool: pooled[i,j] = max over conv[2i+dy, 2j+dx]; the 9 terms
#     reduce to 3 masked lane-rolls by factoring row-max before col-max
#     (phase p1 shifted down supplies dy=-1; col phase px=1 shifted
#     supplies dx=-1).  Maxes run on the bf16 cast — exact, because
#     round-to-bf16 is monotone so cast(max(a,b)) == max(cast(a),
#     cast(b)).
#
# Measured (1× v5e, b256 bf16, carried-sum chain harness): 3.2 µs/img
# vs 6.6 for XLA's conv+reduce_window stem from NHWC u8 — the
# (B,176,176,24) intermediate (380 MB per b256 batch written + re-read)
# never exists.  NHWC device input keeps the XLA stem: producing the
# s2d layout on device costs 7.4 µs/img (XLA relayout), more than it
# saves — the win requires the host-side layout.

_STEM_TAPS = ((-1, -1), (-1, 0), (0, -1), (0, 0))


def pack_stem_s2d(stem_w: np.ndarray, stem_b: np.ndarray,
                  scale: float = 1.0 / 255.0):
    """Fold the (3,3,3,24) stem conv (+ input scale) into phase-matmul
    form.

    Returns (W (192,96), bias (96,)): W columns are the 4 output phase
    slabs × 24 channels; rows are tap-major (du,dv)×48 s2d channels
    (yoff·12 + xoff·3 + c, matching `pack_images_s2d` order)."""
    w = np.zeros((192, 96), np.float32)
    b = np.zeros((96,), np.float32)
    for py in range(2):
        for px in range(2):
            ph = py * 2 + px
            b[ph * 24:(ph + 1) * 24] = stem_b
            for ky in range(3):
                v = 2 * py + ky - 1
                du, yoff = (-1, 3) if v < 0 else (0, v)
                for kx in range(3):
                    u = 2 * px + kx - 1
                    dv, xoff = (-1, 3) if u < 0 else (0, u)
                    t = _STEM_TAPS.index((du, dv))
                    for c in range(3):
                        w[t * 48 + yoff * 12 + xoff * 3 + c,
                          ph * 24:(ph + 1) * 24] = stem_w[ky, kx, c] * scale
    return w, b


def pack_images_s2d(images):
    """(B, H, W, 3) uint8 → (B, 48, pad128(H/4·W/4)) uint8 s2d layout.

    Host-side input packing for `input_format="s2d_u8"`; works on numpy
    or jax arrays (the C++ preprocess writes the same layout directly at
    resize time — csrc/preprocess.cc)."""
    xp = np if isinstance(images, np.ndarray) else jnp
    b, ih, iw, _ = images.shape
    h, w = ih // 4, iw // 4
    hw = h * w
    npad = ((hw + 127) // 128) * 128
    x = images.reshape(b, h, 4, w, 4, 3)
    x = x.transpose(0, 2, 4, 5, 1, 3).reshape(b, 48, hw)
    return xp.pad(x, ((0, 0), (0, 0), (0, npad - hw)))


def _stem_body(x, w: int, rthr, w_ref, b_ref, dtype, interpret: bool):
    """x (48, n) uint8 s2d(4) planes → pooled (24, n) dtype, lanes a
    (rows, w) stride-4 grid.  `rthr`: first row whose pool may reach one
    row up (1 unchunked; traced per-chunk when chunked — the halo row
    supplies dy=-1 for every later row)."""
    n = x.shape[-1]
    lane = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    col = lane % w
    row = lane // w

    if interpret:
        xb = x.astype(dtype)
        taps = []
        for (du, dv) in _STEM_TAPS:
            off = du * w + dv
            sh = pltpu.roll(xb, (-off) % n, 1)
            valid = (col + dv >= 0) & (row + du >= 0)
            taps.append(jnp.where(valid, sh, jnp.asarray(0, dtype)))
        stack = jnp.concatenate(taps, 0)
    else:
        # one u8→float convert at (48,n) (Mosaic has no u8→float direct;
        # widen via i32), then taps as packed-pair lane rolls
        xb = x.astype(jnp.int32).astype(jnp.float32).astype(dtype)
        xp = (pltpu.bitcast(xb, jnp.float32)
              if dtype == jnp.bfloat16 else xb)
        taps = []
        for (du, dv) in _STEM_TAPS:
            off = du * w + dv
            sh = pltpu.roll(xp, (-off) % n, 1)
            valid = (col + dv >= 0) & (row + du >= 0)
            taps.append(jnp.where(valid, sh, 0.))
        stack = jnp.concatenate(taps, 0)
        if dtype == jnp.bfloat16:
            stack = pltpu.bitcast(stack, dtype)     # (192, n)

    z = lax.dot_general(w_ref[...], stack, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
    y = jnp.maximum(z + b_ref[...][:, None], 0.0)   # (96, n) f32
    yb = y.astype(dtype)

    neg = jnp.asarray(-jnp.inf, dtype)

    def proll(a, shift):
        if interpret or dtype == jnp.float32:
            return pltpu.roll(a, shift, 1)
        pk = pltpu.bitcast(a, jnp.float32)
        return pltpu.bitcast(pltpu.roll(pk, shift, 1), dtype)

    # pooled[i,j] = max_{dy,dx∈{-1,0,1}} conv[2i+dy, 2j+dx]
    # rows: {p1[i-1], p0[i], p1[i]}; cols likewise over px
    ph = [yb[k * 24:(k + 1) * 24] for k in range(4)]   # [py*2+px]
    rmask = row >= rthr
    R = []
    for px in range(2):
        base = jnp.maximum(ph[px], ph[2 + px])
        sh = jnp.where(rmask, proll(ph[2 + px], w), neg)
        R.append(jnp.maximum(base, sh))
    out = jnp.maximum(R[0], R[1])
    out = jnp.maximum(out, jnp.where(col >= 1, proll(R[1], 1), neg))
    return out.astype(dtype)


def _stem_kernel(x_ref, w_ref, b_ref, o_ref, *, w: int, dtype,
                 interpret: bool):
    """One whole image per program: x (1, 48, npad) u8 → (1, 24, npad)."""
    o_ref[0] = _stem_body(x_ref[0], w, 1, w_ref, b_ref, dtype, interpret)


def _stem_kernel_chunk(x_ref, w_ref, b_ref, o_ref, *, w: int, dtype,
                       interpret: bool):
    """One row-chunk per program: x (1, 1, 48, Lpad) u8 holding rows
    [c·r−1, (c+1)·r) of the s2d grid (zero halo row for c=0) →
    (1, 1, 24, Lpad); the caller discards each chunk's first output row.

    With the halo in-band, conv taps that reach up land on real data
    (or the zero halo ≡ conv zero padding); only the POOL's dy=-1 term
    at the true image top (chunk 0, within-chunk row 1) must be masked
    — reduce_window pads with -inf, not zeros."""
    c = pl.program_id(1)
    rthr = jnp.where(c == 0, 2, 0)
    o_ref[0, 0] = _stem_body(x_ref[0, 0], w, rthr, w_ref, b_ref, dtype,
                             interpret)


def _stem_call(xt, w96, b96, h, w, dtype, interpret):
    b, _, npad = xt.shape
    kern = functools.partial(_stem_kernel, w=w, dtype=dtype,
                             interpret=interpret)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 48, npad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 24, npad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 24, npad), dtype),
        interpret=interpret,
    )(xt, w96, b96)


_STEM_LANE_BUDGET = 8192  # per-program lanes; ~1.2 kB VMEM per lane


def _stem_chunk_rows(h: int, w: int) -> int:
    """Largest divisor r of h with (r+1)·w within the VMEM lane budget."""
    best = 0
    for r in range(1, h + 1):
        if h % r == 0 and (r + 1) * w <= _STEM_LANE_BUDGET:
            best = r
    if best == 0:
        raise ValueError(f"image row of {w} s2d lanes exceeds the stem "
                         f"kernel's VMEM budget ({_STEM_LANE_BUDGET})")
    return best


def _stem_call_chunked(xt, w96, b96, h, w, dtype, interpret):
    """Fused stem for inputs too large for one program: row-chunks with
    a one-row halo.  xt (B, 48, npad) u8 → (B, 24, h·w) dtype."""
    b, _, npad = xt.shape
    hw = h * w
    r = _stem_chunk_rows(h, w)
    nc = h // r
    lh = (r + 1) * w
    lpad = (lh + 127) // 128 * 128
    # halo: one zero row in front, then chunk c = lanes [c·r·w, c·r·w+lh)
    xp = jnp.pad(xt[:, :, :hw], ((0, 0), (0, 0), (w, lpad - w)))
    xc = jnp.stack([xp[:, :, c * r * w:c * r * w + lpad]
                    for c in range(nc)], 1)          # (B, nc, 48, lpad)
    kern = functools.partial(_stem_kernel_chunk, w=w, dtype=dtype,
                             interpret=interpret)
    out = pl.pallas_call(
        kern,
        grid=(b, nc),
        in_specs=[pl.BlockSpec((1, 1, 48, lpad), lambda i, c: (i, c, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 24, lpad), lambda i, c: (i, c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nc, 24, lpad), dtype),
        interpret=interpret,
    )(xc, w96, b96)
    kept = out[:, :, :, w:w + r * w]                 # drop halo-row output
    return kept.transpose(0, 2, 1, 3).reshape(b, 24, hw)


# --------------------------------------------- phase-packed stem (s2d8)
#
# The whole-backbone future step named by the fuse_s2 note: the stem
# emitted PHASE-PACKED, so stage 2's fused stride-2+span program starts
# straight from the stem's output with no phase-split permute (the 6-D
# transpose that made fuse_s2 a net loss).  The recipe is the s2d trick
# one level deeper: host packs s2d(8) — lanes are the (H/8, W/8) grid,
# 8·8·3 = 192 channels — and the kernel computes all SIXTEEN conv
# output phases (conv grid H/2 = 4 phases per coarse cell per axis) as
# one (384, 4·192) @ (4·192, N) matmul, then folds the 3×3 s2 maxpool
# across conv phases (coarse rolls only at the py=0 / px=0 edges) into
# the four POOLED phases (py, px) ∈ {0,1}² of the (H/4, W/4) grid.
# Output (B, 4·24, pad128(H/8·W/8)) = exactly `_s2span_call`'s
# phase-major stage-2 input: phase p = (y%2)·2 + (x%2), lanes the
# stride-2 span grid.  No padding step is needed either: pad lanes
# carry finite junk that the prologue/span masks and non-positive tap
# offsets keep out of every valid lane.
#
# Deeper-K bonus: K grows 192 → 768 (denser MXU work per output) and
# the written activation volume halves (96 rows × N/4 lanes vs 24 × N).

_STEM8_LANE_BUDGET = 2048   # lanes/program; ~5.5 kB VMEM per lane


def pack_stem_s2d8(stem_w: np.ndarray, stem_b: np.ndarray,
                   scale: float = 1.0 / 255.0):
    """Fold the (3,3,3,24) stem conv (+ input scale) into 16-phase
    matmul form for the s2d(8) layout.

    Returns (W (768, 384), bias (384,)): W columns are 16 conv output
    phase slabs (qy·4+qx major) × 24 channels; rows are tap-major
    (du,dv) ∈ {-1,0}² × 192 s2d(8) channels (yoff·24 + xoff·3 + c)."""
    w = np.zeros((768, 384), np.float32)
    b = np.zeros((384,), np.float32)
    for qy in range(4):
        for qx in range(4):
            ph = qy * 4 + qx
            b[ph * 24:(ph + 1) * 24] = stem_b
            for ky in range(3):
                v = 2 * qy + ky - 1
                du, yoff = (-1, 7) if v < 0 else (0, v)
                for kx in range(3):
                    u = 2 * qx + kx - 1
                    dv, xoff = (-1, 7) if u < 0 else (0, u)
                    t = _STEM_TAPS.index((du, dv))
                    for c in range(3):
                        w[t * 192 + yoff * 24 + xoff * 3 + c,
                          ph * 24:(ph + 1) * 24] = stem_w[ky, kx, c] * scale
    return w, b


def pack_images_s2d8(images):
    """(B, H, W, 3) uint8 → (B, 192, pad128(H/8·W/8)) uint8 s2d(8)."""
    xp = np if isinstance(images, np.ndarray) else jnp
    b, ih, iw, _ = images.shape
    h, w = ih // 8, iw // 8
    hw = h * w
    npad = ((hw + 127) // 128) * 128
    x = images.reshape(b, h, 8, w, 8, 3)
    x = x.transpose(0, 2, 4, 5, 1, 3).reshape(b, 192, hw)
    return xp.pad(x, ((0, 0), (0, 0), (0, npad - hw)))


def _stem8_body(x, w: int, w_ref, b_ref, dtype, interpret: bool):
    """x (192, n) uint8 s2d(8) planes → phase-packed pooled (96, n)
    dtype; lanes the (rows, w) stride-8 coarse grid."""
    n = x.shape[-1]
    lane = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    col = lane % w
    row = lane // w

    if interpret:
        xb = x.astype(dtype)
        xp = xb
        packed = False
    else:
        xb = x.astype(jnp.int32).astype(jnp.float32).astype(dtype)
        packed = dtype == jnp.bfloat16
        xp = pltpu.bitcast(xb, jnp.float32) if packed else xb
    taps = []
    for (du, dv) in _STEM_TAPS:
        off = du * w + dv
        sh = pltpu.roll(xp, (-off) % n, 1)
        valid = (col + dv >= 0) & (row + du >= 0)
        taps.append(jnp.where(valid, sh,
                              jnp.asarray(0, sh.dtype)))
    stack = jnp.concatenate(taps, 0)
    if packed:
        stack = pltpu.bitcast(stack, dtype)          # (768, n)
    else:
        stack = stack.astype(dtype)

    z = lax.dot_general(w_ref[...], stack, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
    y = jnp.maximum(z + b_ref[...][:, None], 0.0)    # (384, n) f32
    yb = y.astype(dtype)

    neg = jnp.asarray(-jnp.inf, dtype)

    def proll(a, shift):
        if interpret or dtype == jnp.float32:
            return pltpu.roll(a, shift, 1)
        pk = pltpu.bitcast(a, jnp.float32)
        return pltpu.bitcast(pltpu.roll(pk, shift, 1), dtype)

    ph = [yb[q * 24:(q + 1) * 24] for q in range(16)]  # q = qy·4 + qx
    # column reduce: pooled col phase px gathers conv cols 2S+px+dx,
    # i.e. qx ∈ {3@S-1, 0, 1} for px=0 (left roll, -inf at S=0) and
    # qx ∈ {1, 2, 3} for px=1 (roll-free)
    cmax = {}
    for qy in range(4):
        p0, p1, p2, p3 = ph[4 * qy:4 * qy + 4]
        left = jnp.where(col >= 1, proll(p3, 1), neg)
        cmax[(qy, 0)] = jnp.maximum(jnp.maximum(p0, p1), left)
        cmax[(qy, 1)] = jnp.maximum(jnp.maximum(p1, p2), p3)
    # row reduce: same pattern one axis up; output phase-major (py,px)
    out = []
    for py in range(2):
        for px in range(2):
            if py == 0:
                up = jnp.where(row >= 1, proll(cmax[(3, px)], w), neg)
                r = jnp.maximum(jnp.maximum(cmax[(0, px)], cmax[(1, px)]),
                                up)
            else:
                r = jnp.maximum(jnp.maximum(cmax[(1, px)], cmax[(2, px)]),
                                cmax[(3, px)])
            out.append(r)
    return jnp.concatenate(out, 0).astype(dtype)     # (96, n)


def _stem8_kernel(x_ref, w_ref, b_ref, o_ref, *, w: int, dtype,
                  interpret: bool):
    """One whole image per program: (1, 192, npad) u8 → (1, 96, npad)."""
    o_ref[0] = _stem8_body(x_ref[0], w, w_ref, b_ref, dtype, interpret)


def _stem8_call(xt, w768, b384, h, w, dtype, interpret):
    b, _, npad = xt.shape
    kern = functools.partial(_stem8_kernel, w=w, dtype=dtype,
                             interpret=interpret)
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 192, npad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 96, npad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 96, npad), dtype),
        interpret=interpret,
    )(xt, w768, b384)


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


def _dwcb_xla(x, p, head, dtype):
    """Head DWConvblock in XLA with folded weights (ReLU between the dw
    and pw convs here, so no composition is possible — and XLA already
    runs these small convs near-optimally)."""
    for dw, pw in ((f"{head}_dw1", f"{head}_pw1"),
                   (f"{head}_dw2", f"{head}_pw2")):
        wd = p[dw + "_w"][:, :, None, :]
        x = jnp.maximum(_conv(x, wd.astype(dtype), 1, groups=x.shape[-1])
                        + p[dw + "_b"], 0.0).astype(dtype)
        x = (x @ p[pw + "_w"] + p[pw + "_b"]).astype(dtype)
    return x


def _fpn_xla(c2, c3, p, dtype):
    """LightFPN + shared heads in XLA with folded weights; returns the
    raw-logit 6-tuple (reg2, obj2, cls2, reg3, obj3, cls3) in fp32."""
    s3 = jnp.maximum(c3 @ p["conv1x1_3_w"] + p["conv1x1_3_b"],
                     0.0).astype(dtype)
    up = jnp.repeat(jnp.repeat(c3, 2, axis=1), 2, axis=2)
    p2 = jnp.concatenate([up, c2], -1)
    s2 = jnp.maximum(p2 @ p["conv1x1_2_w"] + p["conv1x1_2_b"],
                     0.0).astype(dtype)
    outs = []
    for s, tag in ((s2, 2), (s3, 3)):
        cls_f = _dwcb_xla(s, p, f"cls_head_{tag}", dtype)
        reg_f = _dwcb_xla(s, p, f"reg_head_{tag}", dtype)
        reg = (reg_f @ p["output_reg_w"]
               + p["output_reg_b"]).astype(jnp.float32)
        obj = (cls_f @ p["output_obj_w"]
               + p["output_obj_b"]).astype(jnp.float32)
        cls = (cls_f @ p["output_cls_w"]
               + p["output_cls_b"]).astype(jnp.float32)
        outs.append((reg, obj, cls))
    (reg2, obj2, cls2), (reg3, obj3, cls3) = outs
    return reg2, obj2, cls2, reg3, obj3, cls3


def _af_neck_xla(c2, c3, p, dtype):
    """Anchor-free single-scale neck + decoupled heads in XLA with
    folded weights (models/anchorfree.py:52-66); returns the raw-logit
    (obj, cls, reg) 3-tuple in fp32 at stride 16."""
    up = jnp.repeat(jnp.repeat(c3, 2, axis=1), 2, axis=2)
    pcat = jnp.concatenate([c2, up], -1)
    s = jnp.maximum(pcat @ p["fuse_w"] + p["fuse_b"], 0.0).astype(dtype)
    cls_f = _dwcb_xla(s, p, "head_cls", dtype)
    reg_f = _dwcb_xla(s, p, "head_reg", dtype)
    obj = (cls_f @ p["out_obj_w"] + p["out_obj_b"]).astype(jnp.float32)
    cls = (cls_f @ p["out_cls_w"] + p["out_cls_b"]).astype(jnp.float32)
    reg = (reg_f @ p["out_reg_w"] + p["out_reg_b"]).astype(jnp.float32)
    return obj, cls, reg


# ------------------------------------------------------------- builder

def build_fused_forward(variables: dict,
                        input_hw: Tuple[int, int] = (352, 352),
                        anchor_num: int = 3, classes: int = 80,
                        dtype=jnp.bfloat16, interpret: bool = False,
                        input_format: str = "nhwc",
                        upto: str = None, fuse_s2: bool = False,
                        head: str = "yolo"):
    """Returns (forward_fn, packed_weights).

    forward_fn(images, packed) → raw-logit 6-tuple identical to
    Detector.apply(..., train=False).  `packed` must be passed through as
    a runtime argument (weights are never baked constants — see
    fastdet/ops/postprocess.py for the compiler pathology).
    `anchor_num`/`classes` are implied by the checkpoint; the arguments
    exist for non-COCO head shapes (cites reference detector.py:17-19).

    head: "yolo" (LightFPN + shared anchor heads → 6-tuple) or
    "anchorfree" (single-scale fuse + decoupled heads → (obj, cls, reg)
    3-tuple, models/anchorfree.py) — both families share the ShuffleNetV2
    backbone, so the Pallas stem/span kernels serve both.

    input_format:
      * "nhwc"   — (B, H, W, 3) uint8; stem runs in XLA.
      * "s2d_u8" — (B, 48, pad128(H/4·W/4)) uint8 from `pack_images_s2d`
        (host-side layout); stem+pool run as one Pallas kernel, ~2×
        faster than the XLA stem (see module header).

    upto: None for the full forward; "stem"/"s2"/"s3"/"s4" truncate the
    program after that stage and return its NHWC feature map — the
    per-stage timing hook for tools/perf_breakdown.py (docs/PERF.md).

    fuse_s2: run each backbone stage as ONE Pallas program — the
    stride-2 block as a phase-packed prologue (`_s2_prologue`) ahead of
    the span blocks.  Activations stay in the transposed (C, N) layout
    across stage boundaries (one XLA phase-split permute each) instead
    of round-tripping through NHWC for an XLA stride-2 block.

    MEASURED RESULT (v5e, b256 chain-16, fetch-forced): the fusion
    LOSES ~1 µs/img end-to-end (30.2 vs 29.3 µs/img) even after the
    deep-stacked-matmul rewrite; per-stage: s2 6.84 vs 5.29, s3 3.37
    vs 2.84, s4 1.77 vs 1.64 µs/img.  The phase-split permute
    (6-D transpose) + the larger kernel's VMEM pressure cost more than
    the NHWC round-trip they replace — XLA's stride-2 grouped conv is
    already near its latency floor at these sizes.  Default is
    therefore False; the path is kept numerically verified (parity
    tests) as the starting point for a future whole-backbone single
    program (which would also need the stem emitted phase-packed)."""
    if input_format not in ("nhwc", "s2d_u8", "s2d8_u8"):
        raise ValueError(f"unknown input_format {input_format!r}")
    if head not in ("yolo", "anchorfree"):
        raise ValueError(f"unknown head {head!r}")
    if input_format == "s2d8_u8":
        h8, w8 = input_hw[0] // 8, input_hw[1] // 8
        if (input_hw[0] % 8 or input_hw[1] % 8
                or (h8 * w8 + 127) // 128 * 128 > _STEM8_LANE_BUDGET):
            raise ValueError(
                "s2d8_u8 needs H,W divisible by 8 and "
                f"pad128(H/8·W/8) ≤ {_STEM8_LANE_BUDGET} lanes "
                f"(got {input_hw}); use s2d_u8 for larger inputs")
    # whole-image stem programs hold ~1.2 kB VMEM per lane; larger
    # inputs (640² → 25600 lanes) go through the row-chunked stem
    stem_chunked = input_format == "s2d_u8" and \
        ((input_hw[0] // 4) * (input_hw[1] // 4) + 127) // 128 * 128 \
        > _STEM_LANE_BUDGET
    neck = _fpn_xla if head == "yolo" else _af_neck_xla
    pk = (pack_fused_weights(variables) if head == "yolo"
          else pack_fused_weights_af(variables))
    sw96, sb96 = pack_stem_s2d(np.asarray(pk["stem_w"], np.float32),
                               np.asarray(pk["stem_b"], np.float32))
    pk["stem_w96"] = sw96
    pk["stem_b96"] = sb96
    if input_format == "s2d8_u8":
        sw8, sb8 = pack_stem_s2d8(np.asarray(pk["stem_w"], np.float32),
                                  np.asarray(pk["stem_b"], np.float32))
        pk["stem_w768"] = sw8
        pk["stem_b384"] = sb8
    packed = {k: jnp.asarray(v, dtype if np.asarray(v).ndim > 1
                             else jnp.float32) for k, v in pk.items()}
    ih, iw = input_hw
    h4, w4 = ih // 4, iw // 4          # after stem+pool
    hw4 = h4 * w4

    def stem(images, p, want_transposed: bool):
        """→ (B, 24, hw4) transposed or (B, h4, w4, 24) NHWC."""
        b = images.shape[0]
        if input_format == "s2d_u8":
            if stem_chunked:
                ys = _stem_call_chunked(images, p["stem_w96"],
                                        p["stem_b96"], h4, w4, dtype,
                                        interpret)
            else:
                ys = _stem_call(images, p["stem_w96"], p["stem_b96"],
                                h4, w4, dtype, interpret)[:, :, :hw4]
            if want_transposed:
                return ys
            return ys.transpose(0, 2, 1).reshape(b, h4, w4, 24)
        x = images.astype(dtype) / jnp.asarray(255.0, dtype)
        x = _conv(x, p["stem_w"], 2) + p["stem_b"]
        x = jnp.maximum(x, 0.0).astype(dtype)
        x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1),
                              [(0, 0), (1, 1), (1, 1), (0, 0)])
        if want_transposed:
            return x.reshape(b, hw4, 24).transpose(0, 2, 1)
        return x

    def stem8_stage2(images, p):
        """Phase-packed stem + fused stride-2+span stage 2 — no
        phase-split permute, no padding pass.  → (B, 48, nimg2)
        transposed on the stage-2 span grid (pad lanes junk-but-
        finite; every consumer masks or slices them)."""
        b = images.shape[0]
        h, w = h4 // 2, w4 // 2
        nimg = ((h * w + 127) // 128) * 128
        pp = _stem8_call(images, p["stem_w768"], p["stem_b384"],
                         h, w, dtype, interpret)      # (B, 96, nimg)
        g = _pick_group(b, nimg, 48, _LANE_BUDGET_S2)
        xp = pp.reshape(b // g, g, 96, nimg)
        xp = xp.transpose(0, 2, 1, 3).reshape(b // g, 96, g * nimg)
        ws = ([p[f"s2_0f_{nm}"]
               for nm in ("wa", "ba", "wc", "bc", "wp", "bp")]
              + [p[f"s2_{i}_{nm}"] for i in range(1, _STAGES[0][1])
                 for nm in ("wa", "ba", "wc", "bc")])
        xt = _s2span_call(xp, ws, _STAGES[0][1] - 1, h, w, nimg, 24, 48,
                          dtype, interpret)
        xu = xt.reshape(b // g, 48, g, nimg).transpose(0, 2, 1, 3)
        return xu.reshape(b, 48, nimg)

    def stem8_nhwc(images, p):
        """Diagnostic phase-unpack of the s2d8 stem (upto='stem')."""
        b = images.shape[0]
        h, w = h4 // 2, w4 // 2
        pp = _stem8_call(images, p["stem_w768"], p["stem_b384"],
                         h, w, dtype, interpret)[:, :, :h * w]
        x6 = pp.reshape(b, 2, 2, 24, h, w)
        return x6.transpose(0, 4, 1, 5, 2, 3).reshape(b, h4, w4, 24)

    def forward_xla_s2(images, p):
        """Round-2 path: XLA stride-2 blocks, NHWC between stages (for
        s2d8 input, stage 2 runs stem-direct as one fused program)."""
        b = images.shape[0]
        if input_format == "s2d8_u8":
            if upto == "stem":
                return stem8_nhwc(images, p)
            x = None
        else:
            x = stem(images, p, want_transposed=False)
            if upto == "stem":
                return x
        h, w = h4, w4
        cin = 24
        feats = {}
        for sid, reps, c in _STAGES:
            h, w = h // 2, w // 2
            hw = h * w
            nimg = ((hw + 127) // 128) * 128
            if sid == 2 and input_format == "s2d8_u8":
                xt2 = stem8_stage2(images, p)        # (B, 48, nimg)
                x = (xt2[:, :, :hw].transpose(0, 2, 1)
                     .reshape(b, h, w, c))
            else:
                g = _pick_group(b, nimg, c)
                x = _s2_block_xla(x, p, f"s{sid}_0", cin, c, dtype)
                # pack: (B,h,w,C) -> (B//g, C, g*nimg), zero-pad lanes
                xt = x.reshape(b, hw, c)
                xt = jnp.pad(xt, ((0, 0), (0, nimg - hw), (0, 0)))
                xt = xt.transpose(0, 2, 1).reshape(b // g, g, c, nimg)
                xt = xt.transpose(0, 2, 1, 3).reshape(b // g, c,
                                                      g * nimg)
                ws = [p[f"s{sid}_{i}_{nm}"] for i in range(1, reps)
                      for nm in ("wa", "ba", "wc", "bc")]
                xt = _span_call(xt, ws, reps - 1, h, w, nimg, c, dtype,
                                interpret)
                # unpack to NHWC for the next stride-2 block / FPN
                xu = xt.reshape(b // g, c, g, nimg).transpose(0, 2, 1, 3)
                xu = xu.reshape(b, c, nimg)[:, :, :hw].transpose(0, 2, 1)
                x = xu.reshape(b, h, w, c)
            feats[sid] = x
            cin = c
            if upto == f"s{sid}":
                return x
        return neck(feats[3], feats[4], p, dtype)

    def forward_fused_s2(images, p):
        """One Pallas program per stage; activations stay transposed
        across stage boundaries (a phase-split permute replaces the
        NHWC round-trip + XLA stride-2 block)."""
        if upto == "stem":
            return (stem8_nhwc(images, p)
                    if input_format == "s2d8_u8"
                    else stem(images, p, want_transposed=False))
        b = images.shape[0]
        if input_format == "s2d8_u8":
            xt_full = None          # stage 2 runs stem-direct below
        else:
            xt_full = stem(images, p, want_transposed=True)  # (B,24,hw)
        h, w = h4, w4
        cin = 24
        feats = {}
        for sid, reps, c in _STAGES:
            h, w = h // 2, w // 2
            hw = h * w
            nimg = ((hw + 127) // 128) * 128
            if sid == 2 and input_format == "s2d8_u8":
                xt_full = stem8_stage2(images, p)[:, :, :hw]
                cin = c
                if upto == "s2":
                    return (xt_full.transpose(0, 2, 1)
                            .reshape(b, h, w, c))
                continue
            g = _pick_group(b, nimg, c, _LANE_BUDGET_S2)
            # phase-split: (B, cin, 2h·2w) → (B, 4·cin, hw), phase-major
            xp = xt_full.reshape(b, cin, h, 2, w, 2)
            xp = xp.transpose(0, 3, 5, 1, 2, 4).reshape(b, 4 * cin, hw)
            xp = jnp.pad(xp, ((0, 0), (0, 0), (0, nimg - hw)))
            xp = xp.reshape(b // g, g, 4 * cin, nimg)
            xp = xp.transpose(0, 2, 1, 3).reshape(b // g, 4 * cin,
                                                  g * nimg)
            ws = ([p[f"s{sid}_0f_{nm}"]
                   for nm in ("wa", "ba", "wc", "bc", "wp", "bp")]
                  + [p[f"s{sid}_{i}_{nm}"] for i in range(1, reps)
                     for nm in ("wa", "ba", "wc", "bc")])
            xt = _s2span_call(xp, ws, reps - 1, h, w, nimg, cin, c,
                              dtype, interpret)
            xu = xt.reshape(b // g, c, g, nimg).transpose(0, 2, 1, 3)
            xt_full = xu.reshape(b, c, nimg)[:, :, :hw]
            cin = c
            if upto == f"s{sid}" or sid >= 3:
                nhwc = xt_full.transpose(0, 2, 1).reshape(b, h, w, c)
                if upto == f"s{sid}":
                    return nhwc
                feats[sid] = nhwc
        return neck(feats[3], feats[4], p, dtype)

    return (forward_fused_s2 if fuse_s2 else forward_xla_s2), packed
