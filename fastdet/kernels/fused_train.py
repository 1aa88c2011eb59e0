"""Custom-VJP fused TRAINING backbone: span kernels with in-kernel BN.

Training's measured cost (docs/PERF.md §2, b128 bf16, v5e) is entirely
forward+backward (26 + 63 µs/img; targets/loss/optimizer are free), and
both run latency-bound XLA at this net's tiny shapes — the same
structural causes the fused inference path already beats (16 vs 26
µs/img forward).  This module gives training the same treatment: each
backbone stride-1 SPAN (the 3/7/3 stride-1 ShuffleV2 blocks of stages
2/3/4, reference model/backbone/shufflenetv2.py:25-63 + stage table
:66-109) runs as ONE Pallas program forward and ONE backward, wrapped
in `jax.custom_vjp`.  Stem, stride-2 blocks, FPN and heads stay XLA
(same split as inference, fastdet/kernels/fused_infer.py).

Layout and tap structure are the inference span kernel's (transposed
(C, N) lanes, 9 masked lane-rolls); what training adds:

  * **Live BatchNorm.**  Inference folds BN into the convs; training
    must compute batch statistics.  A full-batch BN is a global
    reduction BETWEEN every conv — three hard sync points per block, so
    fusing a span around exact full-batch BN is structurally impossible
    (each BN would split the span back into per-conv XLA programs).
    Instead the kernel computes **ghost BN**: statistics over the
    images resident in one program (the kernel group, 2–16 images =
    4k–8k samples/channel).  Ghost BN is a documented regularizer
    (Hoffer et al., "Train longer, generalize better", NeurIPS 2017);
    at these sample counts the stats are tight.  RUNNING stats are
    still EXACT full-batch: the kernel emits each group's (mean, var)
    and the wrapper combines them (var = E_g[var_g + μ_g²] − μ²), so
    eval-mode behavior is identical in expectation to the standard
    path.  This mode is opt-in (`--fused-backbone`); the default path
    keeps exact full-batch BN and torch-oracle grad parity.
  * **dw3×3 rides the MXU via a diag-expanded weight.**  The inference
    trick (dw ∘ pw2 as one matmul) is illegal here — BN2 sits between
    them with batch-dependent stats — but u2 = Σ_t w_t ⊙ roll_t(y) is
    still one MXU matmul against the stacked taps with the (mid, 9·mid)
    block-diagonal expansion diag(w_t) per tap block (per-tap VPU FMAs
    measured the stage-2 span into a net LOSS vs XLA).
  * **Backward recomputes the span forward from saved block inputs**
    (one (nblk, C, N) residual per program — the same activation
    volume XLA's autodiff would save) using the saved ghost stats, then
    backprops: BN backward needs only within-group reductions (the
    ghost-BN payoff — a full-batch BN backward would need the same
    global syncs as forward), dX via transposed matmuls + reversed
    masked rolls, dW via MXU matmuls (du1 xᵀ, du3 vᵀ, du2 ystackᵀ —
    the last returned as the full (mid, 9·mid) product whose eye-mask
    construction VJP extracts the per-tap diagonals), accumulated
    across the sequential grid into constant-index output blocks.

Numeric contract: with the group equal to the full batch, ghost ≡
full-batch BN and the whole custom-VJP span matches linen
`ShuffleV2Block` forward AND grads (pinned by tests/test_fused_train.py
against jax.grad through the linen modules, f32 interpret).

Weight leaves stay f32 end-to-end (kernels cast to the compute dtype
internally), so weight cotangents come back f32 with no bf16 rounding
at the custom_vjp boundary.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5


def _acc_t(dtype):
    """Accumulation/stat dtype: f32 everywhere except under an f64
    compute dtype (the x64 parity tests), where flips of near-zero ReLU
    masks would otherwise dominate any fused-vs-linen comparison."""
    return jnp.float64 if dtype == jnp.float64 else jnp.float32

# lanes per training-span program (fwd and bwd must share the group —
# the ghost stats are per program — so the cap is the BACKWARD's VMEM
# high-water mark: recompute working set + residual block + grad
# accumulators).  Validated on hardware by tools/tpu_smoke.py.
_TRAIN_LANE_BUDGET = {48: 4096, 96: 2048, 192: 2048}


def pick_train_group(b: int, nimg: int, c: int) -> int:
    g = 1
    budget = _TRAIN_LANE_BUDGET.get(c, 2048)
    while (b % (g * 2) == 0) and (g * 2 * nimg <= budget):
        g *= 2
    return g


# ------------------------------------------------------------ in-kernel BN
#
# Stats/params ride LANE-major (mid, k) tiles: per-channel scalars are
# (mid, 1) columns, so every read is a natural lane slice (no 1-D
# sublane indexing, which Mosaic lowers poorly).

def _masked_stats(u, mask, m):
    """Two-pass mean/var over masked lanes (linen use_fast_variance=False
    semantics, fastdet/models/layers.py).  u (mid, N) f32, mask (1, N)
    f32 0/1, m = static valid-lane count.  → (μ, var, σinv) (mid, 1)."""
    mu = jnp.sum(u * mask, axis=1, keepdims=True) * (1.0 / m)
    d = (u - mu) * mask
    var = jnp.sum(d * d, axis=1, keepdims=True) * (1.0 / m)
    sinv = lax.rsqrt(var + _EPS)
    return mu, var, sinv


def _bn_bwd(g, xhat, gamma, sinv, mask, m):
    """Backward of y = γ·x̂ + β under ghost stats (reductions over the
    group's valid lanes).  g (mid,N) f32 grad wrt y (already relu- and
    lane-masked).  → (du (masked), dγ (mid,1), dβ (mid,1))."""
    sg = jnp.sum(g, axis=1, keepdims=True)
    sgx = jnp.sum(g * xhat, axis=1, keepdims=True)
    du = (gamma * sinv) * (g - sg * (1.0 / m) - xhat * (sgx * (1.0 / m)))
    return du * mask, sgx, sg


def _tap_geometry(n, nimg, h, w):
    lane = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    li = lane % nimg
    col, row = li % w, li // w
    lane_valid = li < h * w
    valid = []
    for t in range(9):
        dy, dx = t // 3 - 1, t % 3 - 1
        valid.append((col + dx >= 0) & (col + dx < w)
                     & (row + dy >= 0) & (row + dy < h))
    return lane_valid, valid


def _roll_taps(y, valid, n, w, dtype):
    """9 masked lane-rolls of y (mid, N) dtype → list of (mid, N) taps.
    bf16 rides f32 bitcast pairs (Mosaic rolls 32-bit data)."""
    packed = dtype == jnp.bfloat16
    ypk = pltpu.bitcast(y, jnp.float32) if packed else y
    taps = []
    for t in range(9):
        dy, dx = t // 3 - 1, t % 3 - 1
        off = dy * w + dx
        sh = pltpu.roll(ypk, (-off) % n, 1)
        if packed:
            sh = pltpu.bitcast(sh, dtype)
        taps.append(jnp.where(valid[t], sh, jnp.asarray(0, dtype)))
    return taps


def _mmc(a, b, dtype):
    """dtype-cast matmul with f32 (f64 under x64) accumulation."""
    return lax.dot_general(a.astype(dtype), b.astype(dtype),
                           (((1,), (0,)), ((), ())),
                           preferred_element_type=_acc_t(dtype))


def _block_fwd(x, wa_ref, wdw_ref, gb_ref, w2t_ref, geom, n, w, m, dtype):
    """One stride-1 ShuffleV2 block, training forward, ghost BN.

    x (c, N) dtype → (out (c, N) dtype, stats (mid, 16) f32 columns
    [μ1,σinv1,var1, μ2,σinv2,var2, μ3,σinv3,var3, 0…])."""
    lane_valid, valid = geom
    acc = _acc_t(dtype)
    maskf = lane_valid.astype(acc)
    c = x.shape[0]
    mid = c // 2
    gb = gb_ref[...]                                 # (mid, 8) acc

    a = _mmc(wa_ref[...], x, dtype)                  # (c, N) f32
    u1 = a[:mid]
    xe = a[mid:].astype(dtype)                       # even passthrough
    mu1, var1, sinv1 = _masked_stats(u1, maskf, m)
    y = jnp.maximum((u1 - mu1) * (sinv1 * gb[:, 0:1]) + gb[:, 1:2],
                    0.0).astype(dtype)

    # depthwise conv as ONE MXU matmul over the tap stack with the
    # diag-expanded (mid, 9·mid) weight (u2_c = Σ_t w_t,c·tap_t,c;
    # off-diagonal blocks are zero).  Per-tap VPU FMAs measured the
    # stage-2 span into a LOSS vs XLA; the MXU form mirrors the
    # inference kernel's composed-matmul structure.
    ystack = jnp.concatenate(_roll_taps(y, valid, n, w, dtype), 0)
    u2 = _mmc(wdw_ref[...], ystack, dtype)           # (mid, N)
    mu2, var2, sinv2 = _masked_stats(u2, maskf, m)
    v = ((u2 - mu2) * (sinv2 * gb[:, 2:3]) + gb[:, 3:4]).astype(dtype)

    u3 = _mmc(w2t_ref[...], v, dtype)                # (mid, N) f32
    mu3, var3, sinv3 = _masked_stats(u3, maskf, m)
    z = jnp.maximum((u3 - mu3) * (sinv3 * gb[:, 4:5]) + gb[:, 5:6],
                    0.0).astype(dtype)

    out = jnp.concatenate([xe, z], 0)
    zpad = jnp.zeros((mid, 7), acc)
    stats = jnp.concatenate([mu1, sinv1, var1, mu2, sinv2, var2,
                             mu3, sinv3, var3, zpad], 1)   # (mid, 16)
    return out, stats


def _span_train_fwd_kernel(x_ref, *refs, nblk, h, w, nimg, m, dtype):
    """Forward span: x (1,c,N) → out (1,c,N), xsave (1,nblk,c,N) block
    inputs, stats (1,nblk,mid,16)."""
    out_ref, xsave_ref, stats_ref = refs[-3], refs[-2], refs[-1]
    wrefs = refs[:-3]
    n = x_ref.shape[-1]
    geom = _tap_geometry(n, nimg, h, w)
    x = x_ref[0]
    for i in range(nblk):
        wa, wdw, gb, w2t = wrefs[4 * i:4 * i + 4]
        xsave_ref[0, i] = x
        x, stats = _block_fwd(x, wa, wdw, gb, w2t, geom, n, w, m, dtype)
        stats_ref[0, i] = stats
    out_ref[0] = x


def _block_bwd(dy, x, st, wa_ref, wdw_ref, gb_ref, w2t_ref, wat_ref,
               w2_ref, geom, n, w, m, dtype):
    """One block's backward: recompute the forward from the saved block
    input + ghost stats, then backprop.  dy (c,N) f32 lane-masked,
    x (c,N) dtype, st (mid,16) f32 → (dx (c,N) f32, dwa_top (mid,c),
    dwdwx (mid, 9·mid) cotangent of the diag-expanded dw weight,
    dw2t (mid,mid), dgb (mid,8))."""
    lane_valid, valid = geom
    acc = _acc_t(dtype)
    maskf = lane_valid.astype(acc)
    c = x.shape[0]
    mid = c // 2
    gb = gb_ref[...]

    # ---- recompute (same op sequence as _block_fwd, saved stats)
    a = _mmc(wa_ref[...], x, dtype)
    u1 = a[:mid]
    mu1, sinv1 = st[:, 0:1], st[:, 1:2]
    mu2, sinv2 = st[:, 3:4], st[:, 4:5]
    mu3, sinv3 = st[:, 6:7], st[:, 7:8]
    xhat1 = (u1 - mu1) * sinv1
    bn1 = xhat1 * gb[:, 0:1] + gb[:, 1:2]
    y = jnp.maximum(bn1, 0.0).astype(dtype)
    ystack = jnp.concatenate(_roll_taps(y, valid, n, w, dtype), 0)
    u2 = _mmc(wdw_ref[...], ystack, dtype)
    xhat2 = (u2 - mu2) * sinv2
    v = (xhat2 * gb[:, 2:3] + gb[:, 3:4]).astype(dtype)
    u3 = _mmc(w2t_ref[...], v, dtype)
    xhat3 = (u3 - mu3) * sinv3
    relu3 = (xhat3 * gb[:, 4:5] + gb[:, 5:6]) > 0.0

    # ---- backward
    dxe = dy[:mid]                                   # passthrough grad
    dz = dy[mid:]
    gz = jnp.where(relu3, dz, 0.0)
    du3, dg3, db3 = _bn_bwd(gz, xhat3, gb[:, 4:5], sinv3, maskf, m)
    dw2t = lax.dot_general(du3, v.astype(acc),
                           (((1,), (1,)), ((), ())),
                           preferred_element_type=acc)          # (mid,mid)
    dv = _mmc(w2_ref[...], du3, dtype)
    du2, dg2, db2 = _bn_bwd(dv, xhat2, gb[:, 2:3], sinv2, maskf, m)

    # dw grads and dy both as MXU matmuls: dwdwx = du2 @ ystackᵀ (the
    # full (mid, 9·mid) product — the wrapper's eye-mask construction
    # VJP extracts the per-tap diagonals); dy = same expanded weight
    # against the reverse-rolled, validity-masked du2 stack
    du2d = du2.astype(dtype)
    rstack = []
    for t in range(9):
        dy_, dx_ = t // 3 - 1, t % 3 - 1
        off = dy_ * w + dx_
        contrib = jnp.where(valid[t], du2d, jnp.asarray(0, dtype))
        if dtype == jnp.bfloat16:
            pk = pltpu.bitcast(contrib, jnp.float32)
            contrib = pltpu.bitcast(pltpu.roll(pk, off % n, 1), dtype)
        else:
            contrib = pltpu.roll(contrib, off % n, 1)
        rstack.append(contrib)
    dyy = _mmc(wdw_ref[...], jnp.concatenate(rstack, 0), dtype)
    dwdwx = lax.dot_general(du2d, ystack, (((1,), (1,)), ((), ())),
                            preferred_element_type=acc)    # (mid, 9mid)

    gy = jnp.where(bn1 > 0.0, dyy, 0.0)
    du1, dg1, db1 = _bn_bwd(gy, xhat1, gb[:, 0:1], sinv1, maskf, m)

    da = jnp.concatenate([du1, dxe], 0)                    # (c, N) f32
    dx = _mmc(wat_ref[...], da, dtype)
    dwa_top = lax.dot_general(du1, x.astype(acc),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=acc)          # (mid,c)
    dgb = jnp.concatenate([dg1, db1, dg2, db2, dg3, db3,
                           jnp.zeros((mid, 2), acc)], 1)   # (mid,8)
    return dx, dwa_top, dwdwx, dw2t, dgb


def _span_train_bwd_kernel(dy_ref, xsave_ref, stats_ref, *refs, nblk, h,
                           w, nimg, m, dtype):
    """Backward span.  Outputs: dx (1,c,N) f32 per grid step, plus
    grid-accumulated dwa (nblk,mid,c), dwdwx (nblk,mid,9·mid),
    dw2t (nblk,mid,mid), dgb (nblk,mid,8) — f32, constant index maps,
    zero-initialized on the first grid step."""
    dx_ref = refs[-5]
    dwa_ref, ddw_ref, dw2t_ref, dgb_ref = refs[-4:]
    wrefs = refs[:-5]
    n = dy_ref.shape[-1]
    geom = _tap_geometry(n, nimg, h, w)
    lane_valid = geom[0]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwa_ref[...] = jnp.zeros_like(dwa_ref)
        ddw_ref[...] = jnp.zeros_like(ddw_ref)
        dw2t_ref[...] = jnp.zeros_like(dw2t_ref)
        dgb_ref[...] = jnp.zeros_like(dgb_ref)

    dy = jnp.where(lane_valid, dy_ref[0].astype(_acc_t(dtype)), 0.0)
    for i in range(nblk - 1, -1, -1):
        wa, wdw, gb, w2t, wat, w2 = wrefs[6 * i:6 * i + 6]
        dy, dwa_top, ddw, dw2t, dgb = _block_bwd(
            dy, xsave_ref[0, i], stats_ref[0, i], wa, wdw, gb, w2t,
            wat, w2, geom, n, w, m, dtype)
        dwa_ref[i] = dwa_ref[i] + dwa_top
        ddw_ref[i] = ddw_ref[i] + ddw
        dw2t_ref[i] = dw2t_ref[i] + dw2t
        dgb_ref[i] = dgb_ref[i] + dgb
    dx_ref[0] = dy


# ------------------------------------------------------------ pallas calls

def _fwd_call(xt, flat_w, nblk, h, w, nimg, c, m, dtype, interpret):
    bg, _, n = xt.shape
    mid = c // 2
    kern = functools.partial(_span_train_fwd_kernel, nblk=nblk, h=h, w=w,
                             nimg=nimg, m=m, dtype=dtype)
    return pl.pallas_call(
        kern,
        grid=(bg,),
        in_specs=[pl.BlockSpec((1, c, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(flat_w),
        out_specs=[pl.BlockSpec((1, c, n), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, nblk, c, n), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, nblk, mid, 16),
                                lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((bg, c, n), dtype),
                   jax.ShapeDtypeStruct((bg, nblk, c, n), dtype),
                   jax.ShapeDtypeStruct((bg, nblk, mid, 16),
                                        _acc_t(dtype))],
        interpret=interpret,
    )(xt, *flat_w)


def _bwd_call(dyt, xsave, stats, flat_wb, nblk, h, w, nimg, c, m, dtype,
              interpret):
    bg, _, n = dyt.shape
    mid = c // 2
    kern = functools.partial(_span_train_bwd_kernel, nblk=nblk, h=h, w=w,
                             nimg=nimg, m=m, dtype=dtype)

    def acc(*shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kern,
        grid=(bg,),
        in_specs=[pl.BlockSpec((1, c, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, nblk, c, n), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, nblk, mid, 16),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(flat_wb),
        out_specs=[pl.BlockSpec((1, c, n), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   acc(nblk, mid, c), acc(nblk, mid, 9 * mid),
                   acc(nblk, mid, mid), acc(nblk, mid, 8)],
        out_shape=[jax.ShapeDtypeStruct((bg, c, n), _acc_t(dtype)),
                   jax.ShapeDtypeStruct((nblk, mid, c), _acc_t(dtype)),
                   jax.ShapeDtypeStruct((nblk, mid, 9 * mid),
                                        _acc_t(dtype)),
                   jax.ShapeDtypeStruct((nblk, mid, mid), _acc_t(dtype)),
                   jax.ShapeDtypeStruct((nblk, mid, 8), _acc_t(dtype))],
        interpret=interpret,
    )(dyt, xsave, stats, *flat_wb)


# --------------------------------------------------------------- public op

def make_span_train(nblk: int, h: int, w: int, nimg: int, c: int,
                    group: int, dtype=jnp.bfloat16,
                    interpret: bool = False):
    """Build the custom-VJP fused training span for one backbone stage.

    Returns `span(xt, ws) -> (out, stats)` where
      xt (B/g, c, g·nimg) dtype — transposed lane-packed stage input,
      ws = per-block list of 4-tuples, ALL f32 (kernels cast to the
           compute dtype internally so weight cotangents return f32):
           wa (c, c)      merged first matmul (odd-select∘pw1 on top,
                          even passthrough below — fold.pack_s1_block's
                          structure, unfolded),
           wdw (mid, 9·mid) dw3×3 taps DIAG-EXPANDED (column block t =
                          diag(w_t); built as eye·w so its VJP folds
                          the kernel's full du2@ystackᵀ product back to
                          the 9 per-tap diagonals),
           gb (mid, 8)    columns [γ1,β1,γ2,β2,γ3,β3,0,0],
           w2t (mid, mid) pw2ᵀ,
      out (B/g, c, g·nimg) dtype,
      stats (B/g, nblk, mid, 16) f32 ghost-group columns
           [μ,σinv,var] × (BN1, BN2, BN3) — stop-gradient, for the
           exact running-stat combine (`combine_ghost_stats`).
    """
    mid = c // 2
    m = group * h * w                 # valid lanes per program

    def _flat_fwd(ws):
        return [a for blk in ws for a in blk]

    def span(xt, ws):
        out, _xsave, stats = _fwd_call(
            xt, _flat_fwd(ws), nblk, h, w, nimg, c, m, dtype, interpret)
        return out, stats

    def span_fwd(xt, ws):
        out, xsave, stats = _fwd_call(
            xt, _flat_fwd(ws), nblk, h, w, nimg, c, m, dtype, interpret)
        return (out, stats), (xsave, stats, ws)

    def span_bwd(res, cot):
        dy, _dstats = cot          # stats are stop-grad (running stats)
        xsave, stats, ws = res
        flat_wb = []
        for (wa, wdw, gb, w2t) in ws:
            flat_wb += [wa, wdw, gb, w2t, wa.T, w2t.T]
        dx, dwa_top, ddw, dw2t, dgb = _bwd_call(
            dy, xsave, stats, flat_wb, nblk, h, w, nimg, c, m, dtype,
            interpret)
        dws = []
        for i in range(nblk):
            dwa = jnp.concatenate(
                [dwa_top[i], jnp.zeros((mid, c), _acc_t(dtype))], 0)
            dws.append((dwa, ddw[i], dgb[i], dw2t[i]))
        return dx.astype(xsave.dtype), dws

    span_vjp = jax.custom_vjp(span)
    span_vjp.defvjp(span_fwd, span_bwd)
    return span_vjp


def combine_ghost_stats(stats):
    """(G, nblk, mid, 16) per-group columns [μ,σinv,var]×3 → exact
    full-batch (mean, var) per BN (equal group sizes):
    mean = E_g[μ_g], var = E_g[var_g + μ_g²] − mean².

    Returns (means (nblk, mid, 3), vars (nblk, mid, 3)) — BN index on
    the last axis (BN1, BN2, BN3)."""
    st9 = stats[..., :9]
    mus = st9[..., 0::3]                  # (G, nblk, mid, 3)
    vars_ = st9[..., 2::3]
    mean = jnp.mean(mus, axis=0)
    var = jnp.mean(vars_ + mus * mus, axis=0) - mean * mean
    return mean, jnp.maximum(var, 0.0)
