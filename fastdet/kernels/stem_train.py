"""Custom-VJP fused TRAINING stem: conv3×3s2 + ghost BN + ReLU +
maxpool3×3s2, forward and backward, from the s2d(4) uint8 host layout.

Why: the train-step depth breakdown (docs/PERF.md §2, b128 bf16, v5e)
charges the stem 30.9 µs/img of the 90 µs step — a third of training —
because the unfused XLA lowering materializes the (176², 24) conv
activation ~6× (conv out, BN two-pass stats, BN normalize, ReLU, pool,
then SelectAndScatter pool-backward, BN backward reductions, and the
dW correlation), ~15 MB/img of HBM traffic ≈ 18 µs at the 819 GB/s
roof.  Fused, the activation NEVER exists in HBM: forward reads the
371 KB/img uint8 input twice (one stats pass, one normalize+pool pass)
and writes the 0.37 MB pooled output; backward reads input and pooled
cotangent twice and writes only dW — ~2.6 MB/img total, a ~6× traffic
cut, and there is NO dX (images need no gradient).

Structure (mirrors the inference s2d stem, fused_infer.py:254-433, with
live BN inserted):

  * conv: all four output phases as ONE (96, 192)ᵀ MXU matmul over the
    4 lane-rolled s2d taps (u8→bf16 convert once);
  * **ghost BN over the kernel group** (g images, 4·88²·g ≈ 500k
    samples/channel at g=16 — statistically indistinguishable from
    full batch; running stats combine to exact full-batch values, same
    scheme as fastdet/kernels/fused_train.py).  Stats need the whole
    group's conv output BEFORE normalizing, so the grid runs TWO PASSES
    per group — grid (B/g, 2, g), last dim innermost — pass 0
    accumulates per-channel Σ/Σ² into VMEM scratch (persists across
    sequential grid steps), pass 1 recomputes the conv (MXU time is
    free next to the HBM it saves) and emits BN+ReLU+pool;
  * pool backward WITHOUT SelectAndScatter: the forward's factored
    row-max/col-max chain is re-walked with fixed first-term-wins
    precedence masks.  This matches XLA's pool gradient everywhere
    except exact POSITIVE ties inside one window (measure-zero for
    continuous activations; all-zero ReLU-floor ties route a gradient
    that the ReLU mask then kills, so they contribute nothing either
    way);
  * backward pass 0 routes the pooled cotangent to conv phases and
    accumulates the BN-backward reductions (Σg, Σg·x̂, per channel,
    phases folded); pass 1 forms du and accumulates
    dW = du @ tapsᵀ — one (96, N)×(N, 192) MXU matmul per image —
    into a constant-index grid output.

The packed weight (192, 96) is produced by a TRACED permutation
(4 selection matmuls) from the raw (3,3,3,24) kernel with the /255
input scale folded in, so autodiff maps dW_packed back to the linen
parameter exactly (fastdet/train/fused_forward.py wires it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5
_STEM_TAPS = ((-1, -1), (-1, 0), (0, -1), (0, 0))


def _acc_t(dtype):
    return jnp.float64 if dtype == jnp.float64 else jnp.float32


def stem_selection_matrices():
    """4 constant (192, 27) selection matrices S_ph with
    W_packed[:, ph·24:(ph+1)·24] = S_ph @ W.reshape(27, 24): the traced,
    differentiable form of fused_infer.pack_stem_s2d's index loop."""
    mats = []
    for py in range(2):
        for px in range(2):
            S = np.zeros((192, 27), np.float32)
            for ky in range(3):
                v = 2 * py + ky - 1
                du, yoff = (-1, 3) if v < 0 else (0, v)
                for kx in range(3):
                    u = 2 * px + kx - 1
                    dv, xoff = (-1, 3) if u < 0 else (0, u)
                    t = _STEM_TAPS.index((du, dv))
                    for c in range(3):
                        S[t * 48 + yoff * 12 + xoff * 3 + c,
                          (ky * 3 + kx) * 3 + c] = 1.0
            mats.append(S)
    return mats


def pack_stem_weights_traced(kernel, scale: float = 1.0 / 255.0):
    """(3,3,3,24) HWIO conv kernel → (192, 96) phase-matmul form, as
    traced jnp ops (differentiable)."""
    wf = kernel.reshape(27, 24) * scale
    mats = stem_selection_matrices()
    cols = [jnp.asarray(S) @ wf for S in mats]
    return jnp.concatenate(cols, 1)


def _taps(x, col, row, n, w, dtype):
    """s2d u8 (48, n) → tap stack (192, n) dtype."""
    xb = x.astype(jnp.int32).astype(jnp.float32).astype(dtype)
    packed = dtype == jnp.bfloat16
    xp = pltpu.bitcast(xb, jnp.float32) if packed else xb
    taps = []
    for (du, dv) in _STEM_TAPS:
        off = du * w + dv
        sh = pltpu.roll(xp, (-off) % n, 1)
        valid = (col + dv >= 0) & (row + du >= 0)
        taps.append(jnp.where(valid, sh, 0.))
    stack = jnp.concatenate(taps, 0)
    if packed:
        stack = pltpu.bitcast(stack, dtype)
    else:
        stack = stack.astype(dtype)
    return stack


def _geom(n, w):
    lane = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    return lane % w, lane // w


def _eqf(a, b):
    """Equality compare via f32 (Mosaic rejects bf16 cmpf on v5e);
    exact — both sides are bf16-representable values."""
    return a.astype(jnp.float32) == b.astype(jnp.float32)


def _fold4(s96):
    """(96, k) per-phase rows → (24, k) channel fold (phases share BN
    channels)."""
    return s96[0:24] + s96[24:48] + s96[48:72] + s96[72:96]


def _conv_u(x, w_ref, col, row, n, w, dtype):
    stack = _taps(x, col, row, n, w, dtype)
    return lax.dot_general(w_ref[...].astype(dtype), stack,
                           (((0,), (0,)), ((), ())),
                           preferred_element_type=_acc_t(dtype))  # (96,n)


def _stem_train_fwd_kernel(x_ref, w_ref, gv_ref, bv_ref, y_ref, st_ref,
                           sum_ref, sq_ref, *, w: int, hw: int, g: int,
                           m: int, dtype):
    """grid (B/g, 2, g): pass 0 accumulates Σ/Σ² of the conv output into
    scratch; pass 1 normalizes (ghost BN) + ReLU + pool and writes
    y (1, 24, n) and stats (1, 24, 8) [μ, σinv, var]."""
    n = x_ref.shape[-1]
    acc = _acc_t(dtype)
    p_ = pl.program_id(1)
    j = pl.program_id(2)
    col, row = _geom(n, w)
    lanev = (col + row * w) < hw            # == lane < hw
    maskf = lanev.astype(acc)

    @pl.when((p_ == 0) & (j == 0))
    def _reset():
        sum_ref[...] = jnp.zeros_like(sum_ref)
        sq_ref[...] = jnp.zeros_like(sq_ref)

    u = _conv_u(x_ref[0], w_ref, col, row, n, w, dtype)   # (96, n) acc

    @pl.when(p_ == 0)
    def _accum():
        um = u * maskf
        sum_ref[...] += _fold4(jnp.sum(um, axis=1, keepdims=True))
        sq_ref[...] += _fold4(jnp.sum(um * um, axis=1, keepdims=True))

    @pl.when(p_ == 1)
    def _emit():
        mu = sum_ref[...] * (1.0 / m)                     # (24, 1)
        var = sq_ref[...] * (1.0 / m) - mu * mu
        var = jnp.maximum(var, 0.0)
        sinv = lax.rsqrt(var + _EPS)
        mu4 = jnp.concatenate([mu] * 4, 0)                # (96, 1)
        sinv4 = jnp.concatenate([sinv] * 4, 0)
        yb = jnp.maximum((u - mu4) * (sinv4 * gv_ref[...])
                         + bv_ref[...], 0.0).astype(dtype)

        neg = jnp.asarray(-jnp.inf, dtype)

        def proll(a, shift):
            if dtype == jnp.bfloat16:
                pk = pltpu.bitcast(a, jnp.float32)
                return pltpu.bitcast(pltpu.roll(pk, shift, 1), dtype)
            return pltpu.roll(a, shift, 1)

        ph = [yb[k * 24:(k + 1) * 24] for k in range(4)]  # [py*2+px]
        R = []
        for px in range(2):
            base = jnp.maximum(ph[px], ph[2 + px])
            sh = jnp.where(row >= 1, proll(ph[2 + px], w), neg)
            R.append(jnp.maximum(base, sh))
        out = jnp.maximum(R[0], R[1])
        out = jnp.maximum(out, jnp.where(col >= 1, proll(R[1], 1), neg))
        y_ref[0] = out.astype(dtype)
        z5 = jnp.zeros((24, 5), st_ref.dtype)
        st_ref[0] = jnp.concatenate(
            [mu.astype(st_ref.dtype), sinv.astype(st_ref.dtype),
             var.astype(st_ref.dtype), z5], 1)


def _stem_train_bwd_kernel(dz_ref, x_ref, st_ref, w_ref, gv_ref, bv_ref,
                           dwp_ref, dgb_ref, sg_ref, sgx_ref, *, w: int,
                           hw: int, g: int, m: int, dtype):
    """grid (B/g, 2, g): pass 0 recomputes the forward, routes the
    pooled cotangent through the max chain (first-term-wins precedence)
    and ReLU, accumulates BN-backward reductions; pass 1 recomputes,
    forms du, accumulates dW_packed (192, 96) and d(γ,β) partials
    (96, 8 columns [dγ, dβ])."""
    n = x_ref.shape[-1]
    acc = _acc_t(dtype)
    i = pl.program_id(0)
    p_ = pl.program_id(1)
    j = pl.program_id(2)
    col, row = _geom(n, w)
    lanev = (col + row * w) < hw
    maskf = lanev.astype(acc)

    @pl.when((i == 0) & (p_ == 0) & (j == 0))
    def _init_out():
        dwp_ref[...] = jnp.zeros_like(dwp_ref)
        dgb_ref[...] = jnp.zeros_like(dgb_ref)

    @pl.when((p_ == 0) & (j == 0))
    def _reset():
        sg_ref[...] = jnp.zeros_like(sg_ref)
        sgx_ref[...] = jnp.zeros_like(sgx_ref)

    # ---- shared recompute (both passes)
    stack = _taps(x_ref[0], col, row, n, w, dtype)        # (192, n)
    u = lax.dot_general(w_ref[...].astype(dtype), stack,
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=acc)       # (96, n)
    st = st_ref[0]
    mu4 = jnp.concatenate([st[:, 0:1]] * 4, 0)
    sinv4 = jnp.concatenate([st[:, 1:2]] * 4, 0)
    xhat = (u - mu4) * sinv4
    bn = xhat * gv_ref[...] + bv_ref[...]
    yb = jnp.maximum(bn, 0.0).astype(dtype)
    relu_m = bn > 0.0

    neg = jnp.asarray(-jnp.inf, dtype)

    def proll(a, shift):
        if a.dtype == jnp.bfloat16:
            pk = pltpu.bitcast(a, jnp.float32)
            return pltpu.bitcast(pltpu.roll(pk, shift, 1), dtype)
        return pltpu.roll(a, shift, 1)

    ph = [yb[k * 24:(k + 1) * 24] for k in range(4)]
    R, bases, shifts = [], [], []
    for px in range(2):
        base = jnp.maximum(ph[px], ph[2 + px])
        sh = jnp.where(row >= 1, proll(ph[2 + px], w), neg)
        bases.append(base)
        shifts.append(sh)
        R.append(jnp.maximum(base, sh))
    T2 = jnp.where(col >= 1, proll(R[1], 1), neg)
    out = jnp.maximum(jnp.maximum(R[0], R[1]), T2)

    # ---- route pooled cotangent to conv phases (precedence masks)
    dz = jnp.where(lanev, dz_ref[0].astype(acc), 0.0)     # (24, n)
    m0 = _eqf(R[0], out)
    m1 = _eqf(R[1], out) & ~m0
    m2 = _eqf(T2, out) & ~m0 & ~m1
    dR0 = jnp.where(m0, dz, 0.0)
    dR1 = (jnp.where(m1, dz, 0.0)
           + pltpu.roll(jnp.where(m2 & (col >= 1), dz, 0.0), n - 1, 1))
    gy_ph = [None] * 4
    for px, dR in ((0, dR0), (1, dR1)):
        # precedence within R: ph[px] first, ph[2+px], then shifted
        e0 = _eqf(ph[px], R[px])
        e1 = _eqf(ph[2 + px], R[px]) & ~e0
        e2 = _eqf(shifts[px], R[px]) & ~e0 & ~e1
        d0 = jnp.where(e0, dR, 0.0)
        d1 = (jnp.where(e1, dR, 0.0)
              + pltpu.roll(jnp.where(e2 & (row >= 1), dR, 0.0),
                           (-w) % n, 1))
        gy_ph[px] = d0
        gy_ph[2 + px] = d1
    gy = jnp.concatenate(gy_ph, 0)                        # (96, n)
    gy = jnp.where(relu_m, gy, 0.0) * maskf

    @pl.when(p_ == 0)
    def _accum():
        sg_ref[...] += _fold4(jnp.sum(gy, axis=1, keepdims=True))
        sgx_ref[...] += _fold4(jnp.sum(gy * xhat, axis=1, keepdims=True))

    @pl.when(p_ == 1)
    def _grads():
        sg4 = jnp.concatenate([sg_ref[...]] * 4, 0)       # (96, 1)
        sgx4 = jnp.concatenate([sgx_ref[...]] * 4, 0)
        du = (gv_ref[...] * sinv4) * (gy - sg4 * (1.0 / m)
                                      - xhat * (sgx4 * (1.0 / m)))
        du = du * maskf
        dwp_ref[...] += lax.dot_general(
            stack.astype(dtype), du.astype(dtype),
            (((1,), (1,)), ((), ())),
            preferred_element_type=acc)                   # (192, 96)

        @pl.when(j == 0)
        def _dgb():
            zpad = jnp.zeros((96, 6), dgb_ref.dtype)
            sgx4_ = jnp.concatenate([sgx_ref[...]] * 4, 0)
            sg4_ = jnp.concatenate([sg_ref[...]] * 4, 0)
            dgb_ref[...] += jnp.concatenate([sgx4_, sg4_, zpad], 1)


def _stem_train_fwd1_kernel(x_ref, w_ref, gv_ref, bv_ref, y_ref, st_ref,
                            *, w: int, hw: int, m: int, dtype):
    """Single-pass per-image variant (ghost group 1 = the whole image,
    4·hw ≈ 31k samples/channel): stats inline, no revisit grid — half
    the tap/conv work of the grouped 2-pass form."""
    n = x_ref.shape[-1]
    acc = _acc_t(dtype)
    col, row = _geom(n, w)
    lanev = (col + row * w) < hw
    maskf = lanev.astype(acc)

    u = _conv_u(x_ref[0], w_ref, col, row, n, w, dtype)   # (96, n) acc
    um = u * maskf
    s1 = _fold4(jnp.sum(um, axis=1, keepdims=True))
    s2 = _fold4(jnp.sum(um * um, axis=1, keepdims=True))
    mu = s1 * (1.0 / m)
    var = jnp.maximum(s2 * (1.0 / m) - mu * mu, 0.0)
    sinv = lax.rsqrt(var + _EPS)
    mu4 = jnp.concatenate([mu] * 4, 0)
    sinv4 = jnp.concatenate([sinv] * 4, 0)
    yb = jnp.maximum((u - mu4) * (sinv4 * gv_ref[...]) + bv_ref[...],
                     0.0).astype(dtype)

    neg = jnp.asarray(-jnp.inf, dtype)

    def proll(a, shift):
        if dtype == jnp.bfloat16:
            pk = pltpu.bitcast(a, jnp.float32)
            return pltpu.bitcast(pltpu.roll(pk, shift, 1), dtype)
        return pltpu.roll(a, shift, 1)

    ph = [yb[k * 24:(k + 1) * 24] for k in range(4)]
    R = []
    for px in range(2):
        base = jnp.maximum(ph[px], ph[2 + px])
        sh = jnp.where(row >= 1, proll(ph[2 + px], w), neg)
        R.append(jnp.maximum(base, sh))
    out = jnp.maximum(R[0], R[1])
    out = jnp.maximum(out, jnp.where(col >= 1, proll(R[1], 1), neg))
    y_ref[0] = out.astype(dtype)
    z5 = jnp.zeros((24, 5), st_ref.dtype)
    st_ref[0] = jnp.concatenate(
        [mu.astype(st_ref.dtype), sinv.astype(st_ref.dtype),
         var.astype(st_ref.dtype), z5], 1)


def _stem_train_bwd1_kernel(dz_ref, x_ref, st_ref, w_ref, gv_ref, bv_ref,
                            dwp_ref, dgb_ref, *, w: int, hw: int, m: int,
                            dtype):
    """Single-pass per-image backward: recompute, route, reduce, and
    accumulate dW/dγβ in ONE visit per image."""
    n = x_ref.shape[-1]
    acc = _acc_t(dtype)
    i = pl.program_id(0)
    col, row = _geom(n, w)
    lanev = (col + row * w) < hw
    maskf = lanev.astype(acc)

    @pl.when(i == 0)
    def _init_out():
        dwp_ref[...] = jnp.zeros_like(dwp_ref)
        dgb_ref[...] = jnp.zeros_like(dgb_ref)

    # the tap stack is rebuilt for the final dW matmul instead of kept
    # live across the whole kernel — one fused program holding stack +
    # x̂ + gy + du simultaneously measured 16.2 MB of conservatively-
    # allocated stack (over the 16 MB limit); the recompute is 4 rolls
    # of uint8 data
    u = _conv_u(x_ref[0], w_ref, col, row, n, w, dtype)   # (96, n) acc
    st = st_ref[0]
    mu4 = jnp.concatenate([st[:, 0:1]] * 4, 0)
    sinv4 = jnp.concatenate([st[:, 1:2]] * 4, 0)
    xhat = (u - mu4) * sinv4
    bn = xhat * gv_ref[...] + bv_ref[...]
    yb = jnp.maximum(bn, 0.0).astype(dtype)
    relu_m = bn > 0.0

    neg = jnp.asarray(-jnp.inf, dtype)

    def proll(a, shift):
        if a.dtype == jnp.bfloat16:
            pk = pltpu.bitcast(a, jnp.float32)
            return pltpu.bitcast(pltpu.roll(pk, shift, 1), dtype)
        return pltpu.roll(a, shift, 1)

    ph = [yb[k * 24:(k + 1) * 24] for k in range(4)]
    R, bases, shifts = [], [], []
    for px in range(2):
        base = jnp.maximum(ph[px], ph[2 + px])
        sh = jnp.where(row >= 1, proll(ph[2 + px], w), neg)
        bases.append(base)
        shifts.append(sh)
        R.append(jnp.maximum(base, sh))
    T2 = jnp.where(col >= 1, proll(R[1], 1), neg)
    out = jnp.maximum(jnp.maximum(R[0], R[1]), T2)

    dz = jnp.where(lanev, dz_ref[0].astype(acc), 0.0)
    m0 = _eqf(R[0], out)
    m1 = _eqf(R[1], out) & ~m0
    m2 = _eqf(T2, out) & ~m0 & ~m1
    dR0 = jnp.where(m0, dz, 0.0)
    dR1 = (jnp.where(m1, dz, 0.0)
           + pltpu.roll(jnp.where(m2 & (col >= 1), dz, 0.0), n - 1, 1))
    gy_ph = [None] * 4
    for px, dR in ((0, dR0), (1, dR1)):
        e0 = _eqf(ph[px], R[px])
        e1 = _eqf(ph[2 + px], R[px]) & ~e0
        e2 = _eqf(shifts[px], R[px]) & ~e0 & ~e1
        d0 = jnp.where(e0, dR, 0.0)
        d1 = (jnp.where(e1, dR, 0.0)
              + pltpu.roll(jnp.where(e2 & (row >= 1), dR, 0.0),
                           (-w) % n, 1))
        gy_ph[px] = d0
        gy_ph[2 + px] = d1
    gy = jnp.concatenate(gy_ph, 0)
    gy = jnp.where(relu_m, gy, 0.0) * maskf

    sg = _fold4(jnp.sum(gy, axis=1, keepdims=True))
    sgx = _fold4(jnp.sum(gy * xhat, axis=1, keepdims=True))
    sg4 = jnp.concatenate([sg] * 4, 0)
    sgx4 = jnp.concatenate([sgx] * 4, 0)
    du = (gv_ref[...] * sinv4) * (gy - sg4 * (1.0 / m)
                                  - xhat * (sgx4 * (1.0 / m)))
    du = (du * maskf).astype(dtype)
    stack = _taps(x_ref[0], col, row, n, w, dtype)        # (192, n)
    dwp_ref[...] += lax.dot_general(
        stack, du, (((1,), (1,)), ((), ())),
        preferred_element_type=acc)
    zpad = jnp.zeros((96, 6), dgb_ref.dtype)
    dgb_ref[...] += jnp.concatenate([sgx4, sg4, zpad], 1)


def make_stem_train(h4: int, w4: int, npad: int, group: int,
                    dtype=jnp.bfloat16, interpret: bool = False):
    """Build the custom-VJP fused training stem.

    Returns `stem(x_s2d_u8 (B, 48, npad), wp (192, 96), gv (96, 1),
    bv (96, 1)) -> (y (B, 24, npad), stats (B/g, 24, 8))`:
      wp from `pack_stem_weights_traced` (raw kernel, /255 folded),
      gv/bv = BN scale/bias tiled ×4 phases (lane-major columns),
      y = pooled stem output on the (h4, w4) grid,
      stats columns [μ, σinv, var] per ghost group (stop-gradient; feed
      `combine_stem_stats` for the exact full-batch running update).
    """
    hw = h4 * w4
    m = group * hw * 4            # samples/channel/group (4 conv phases)
    acc = _acc_t(dtype)

    def _fwd_call1(x, wp, gv, bv):
        b = x.shape[0]
        kern = functools.partial(_stem_train_fwd1_kernel, w=w4, hw=hw,
                                 m=m, dtype=dtype)
        return pl.pallas_call(
            kern,
            grid=(b,),
            in_specs=[pl.BlockSpec((1, 48, npad), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((1, 24, npad), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, 24, 8), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((b, 24, npad), dtype),
                       jax.ShapeDtypeStruct((b, 24, 8), acc)],
            interpret=interpret,
        )(x, wp, gv, bv)

    def _bwd_call1(dz, x, stats, wp, gv, bv):
        b = x.shape[0]
        kern = functools.partial(_stem_train_bwd1_kernel, w=w4, hw=hw,
                                 m=m, dtype=dtype)
        # Mosaic's conservative stack accounting for this program (tap
        # stack + x̂ + routed gy + du live ranges at 352²: npad 7808)
        # lands at 16.2 MB — just over the 16 MB default scoped-vmem
        # limit (v5e VMEM is 128 MB; the default is a scheduling
        # heuristic, not the hardware).  Grant it 32 MB: one image's
        # blocks are still < 1 MB so double-buffered grid DMA is
        # unaffected.
        return pl.pallas_call(
            kern,
            grid=(b,),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=32 * 1024 * 1024),
            in_specs=[pl.BlockSpec((1, 24, npad), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 48, npad), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 24, 8), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((192, 96), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((96, 8), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((192, 96), acc),
                       jax.ShapeDtypeStruct((96, 8), acc)],
            interpret=interpret,
        )(dz, x, stats, wp, gv, bv)

    def _fwd_call(x, wp, gv, bv):
        if group == 1:
            return _fwd_call1(x, wp, gv, bv)
        b = x.shape[0]
        kern = functools.partial(_stem_train_fwd_kernel, w=w4, hw=hw,
                                 g=group, m=m, dtype=dtype)
        return pl.pallas_call(
            kern,
            grid=(b // group, 2, group),
            in_specs=[pl.BlockSpec((1, 48, npad),
                                   lambda i, p, j, _g=group:
                                   (i * _g + j, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((1, 24, npad),
                                    lambda i, p, j, _g=group:
                                    (i * _g + j, 0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, 24, 8),
                                    lambda i, p, j: (i, 0, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((b, 24, npad), dtype),
                       jax.ShapeDtypeStruct((b // group, 24, 8), acc)],
            scratch_shapes=[pltpu.VMEM((24, 1), acc),
                            pltpu.VMEM((24, 1), acc)],
            interpret=interpret,
        )(x, wp, gv, bv)

    def _bwd_call(dz, x, stats, wp, gv, bv):
        if group == 1:
            return _bwd_call1(dz, x, stats, wp, gv, bv)
        b = x.shape[0]
        kern = functools.partial(_stem_train_bwd_kernel, w=w4, hw=hw,
                                 g=group, m=m, dtype=dtype)
        return pl.pallas_call(
            kern,
            grid=(b // group, 2, group),
            in_specs=[pl.BlockSpec((1, 24, npad),
                                   lambda i, p, j, _g=group:
                                   (i * _g + j, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 48, npad),
                                   lambda i, p, j, _g=group:
                                   (i * _g + j, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 24, 8),
                                   lambda i, p, j: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((192, 96), lambda i, p, j: (0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((96, 8), lambda i, p, j: (0, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((192, 96), acc),
                       jax.ShapeDtypeStruct((96, 8), acc)],
            scratch_shapes=[pltpu.VMEM((24, 1), acc),
                            pltpu.VMEM((24, 1), acc)],
            interpret=interpret,
        )(dz, x, stats, wp, gv, bv)

    def stem(x, wp, gv, bv):
        return _fwd_call(x, wp, gv, bv)

    def stem_fwd(x, wp, gv, bv):
        y, stats = _fwd_call(x, wp, gv, bv)
        return (y, stats), (x, stats, wp, gv, bv)

    def stem_bwd(res, cot):
        dy, _dstats = cot
        x, stats, wp, gv, bv = res
        dwp, dgb = _bwd_call(dy.astype(dtype), x, stats, wp, gv, bv)
        # images are uint8 — their cotangent is the symbolic float0 zero
        if jnp.issubdtype(x.dtype, jnp.floating):
            dx = jnp.zeros(x.shape, x.dtype)
        else:
            dx = np.zeros(x.shape, jax.dtypes.float0)
        # dgb rows are the PHASE-FOLDED Σ, tiled ×4 by the kernel; the
        # wrapper's jnp.tile VJP sums the 4 phase blocks again, so hand
        # it the fold once (phase-0 rows) and zeros elsewhere
        z72 = jnp.zeros((72, 1), dgb.dtype)
        dgv = jnp.concatenate([dgb[0:24, 0:1], z72], 0)
        dbv = jnp.concatenate([dgb[0:24, 1:2], z72], 0)
        return (dx, dwp.astype(wp.dtype), dgv.astype(gv.dtype),
                dbv.astype(bv.dtype))

    stem_vjp = jax.custom_vjp(stem)
    stem_vjp.defvjp(stem_fwd, stem_bwd)
    return stem_vjp


def combine_stem_stats(stats):
    """(G, 24, 8) per-group columns [μ, σinv, var] → exact full-batch
    (mean (24,), var (24,)) (equal group sizes)."""
    mu = stats[:, :, 0]
    var = stats[:, :, 2]
    mean = jnp.mean(mu, axis=0)
    v = jnp.mean(var + mu * mu, axis=0) - mean * mean
    return mean, jnp.maximum(v, 0.0)
