"""Functional train-mode forward with the custom-VJP fused backbone.

Drop-in replacement for `Detector.apply(..., train=True,
mutable=["batch_stats"])` used by the opt-in `--fused-backbone`
training mode: stem, stride-2 blocks, FPN and heads run as explicit XLA
ops with exact full-batch BN (identical semantics to the linen modules,
fastdet/models/{layers,shufflenet,fpn,detector}.py); the backbone's
stride-1 SPANS run as the Pallas custom-VJP kernels of
fastdet/kernels/fused_train.py with ghost BN (stats per kernel group —
see that module's header for why exact full-batch BN cannot fuse).

The params/batch_stats pytrees are the UNMODIFIED linen trees, so
checkpoints, the optimizer, eval (which folds BN running stats) and the
export path are unchanged — only the train-step compute path differs.

With every span group equal to the batch (small batches), this forward
matches `model.apply` exactly (pinned by tests/test_fused_train.py:
outputs, gradients, and new batch_stats vs linen autodiff, f32).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from fastdet.kernels.fused_train import (combine_ghost_stats,
                                         make_span_train,
                                         pick_train_group)
from fastdet.kernels.stem_train import (combine_stem_stats,
                                        make_stem_train,
                                        pack_stem_weights_traced)

_EPS = 1e-5
_MOMENTUM = 0.9
_STAGES = ((2, 4, 48), (3, 8, 96), (4, 4, 192))


def _conv(x, w, stride=1, groups=1):
    return lax.conv_general_dilated(
        x, w, (stride, stride),
        [(w.shape[0] // 2,) * 2, (w.shape[1] // 2,) * 2],
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn_train(u, p_bn, s_bn, dtype):
    """Full-batch train-mode BN (linen semantics: f32 stats, two-pass
    variance, momentum 0.9 running update; f64 stats under the x64
    parity tests).  → (y dtype, new_stats)."""
    uf = u.astype(jnp.promote_types(jnp.float32, u.dtype))
    mean = jnp.mean(uf, axis=(0, 1, 2))
    var = jnp.mean((uf - mean) ** 2, axis=(0, 1, 2))
    y = (uf - mean) * lax.rsqrt(var + _EPS) * p_bn["scale"] + p_bn["bias"]
    new = {"mean": _MOMENTUM * s_bn["mean"] + (1 - _MOMENTUM) * mean,
           "var": _MOMENTUM * s_bn["var"] + (1 - _MOMENTUM) * var}
    return y.astype(dtype), new


def _convbn(x, p, s, dtype, *, stride=1, groups=1, relu=True):
    y = _conv(x.astype(dtype), p["conv"]["kernel"].astype(dtype),
              stride, groups)
    y, new = _bn_train(y, p["bn"], s["bn"], dtype)
    if relu:
        y = jax.nn.relu(y)
    return y, {"bn": new}


def _s2_block(x, p, s, dtype):
    """Stride-2 ShuffleV2 block, train mode (linen ShuffleV2Block
    stride=2: proj = dw s2 (no ReLU) → pw (ReLU); main = pw (ReLU) →
    dw s2 (no ReLU) → pw_linear (ReLU); concat[proj, main])."""
    new = {}
    cin = x.shape[-1]
    proj, new["proj_dw"] = _convbn(x, p["proj_dw"], s["proj_dw"], dtype,
                                   stride=2, groups=cin, relu=False)
    proj, new["proj_pw"] = _convbn(proj, p["proj_pw"], s["proj_pw"],
                                   dtype)
    mid = p["main_pw"]["conv"]["kernel"].shape[-1]
    y, new["main_pw"] = _convbn(x, p["main_pw"], s["main_pw"], dtype)
    y, new["main_dw"] = _convbn(y, p["main_dw"], s["main_dw"], dtype,
                                stride=2, groups=mid, relu=False)
    y, new["main_pw_linear"] = _convbn(y, p["main_pw_linear"],
                                       s["main_pw_linear"], dtype)
    return jnp.concatenate([proj, y], axis=-1), new


def _dwconvblock(x, p, s, dtype):
    """Head DWConvBlock: 2 × [dw5 BN ReLU → pw BN (no ReLU)]."""
    new = {}
    for dw, pw in (("dw1", "pw1"), ("dw2", "pw2")):
        x, new[dw] = _convbn(x, p[dw], s[dw], dtype, groups=x.shape[-1])
        x, new[pw] = _convbn(x, p[pw], s[pw], dtype, relu=False)
    return x, new


def _sel_matrices(c: int):
    mid = c // 2
    sel_odd = np.zeros((c, mid), np.float32)
    sel_odd[np.arange(1, c, 2), np.arange(mid)] = 1.0
    sel_even = np.zeros((mid, c), np.float32)
    sel_even[np.arange(mid), np.arange(0, c, 2)] = 1.0
    return jnp.asarray(sel_odd), jnp.asarray(sel_even)


def _pack_span_ws(bb_p, stage: int, reps: int, c: int):
    """Span weights for make_span_train, traced from the linen params
    (differentiable — cotangents flow back to the original leaves).
    Leaves stay at the params' precision (f32; f64 under x64 tests)."""
    mid = c // 2
    sel_odd, sel_even = _sel_matrices(c)
    ws = []
    for i in range(1, reps):
        blk = bb_p[f"stage{stage}_{i}"]
        w1 = blk["main_pw"]["conv"]["kernel"][0, 0]          # (mid, mid)
        kdw = blk["main_dw"]["conv"]["kernel"][:, :, 0, :]   # (3, 3, mid)
        w2 = blk["main_pw_linear"]["conv"]["kernel"][0, 0]
        acc = jnp.promote_types(jnp.float32, w1.dtype)
        wa = jnp.concatenate([(sel_odd.astype(acc) @ w1).T,
                              sel_even.astype(acc)], 0)
        eye = jnp.eye(mid, dtype=acc)
        wdw = jnp.concatenate(
            [eye * kdw[t // 3, t % 3][None, :] for t in range(9)], 1)
        gcols = []
        for name in ("main_pw", "main_dw", "main_pw_linear"):
            gcols += [blk[name]["bn"]["scale"][:, None],
                      blk[name]["bn"]["bias"][:, None]]
        gb = jnp.concatenate(gcols + [jnp.zeros((mid, 2), acc)], 1)
        ws.append((wa.astype(acc), wdw.astype(acc), gb.astype(acc),
                   w2.T.astype(acc)))
    return ws


def _span_stage_stats(stats, bb_s, stage: int, reps: int):
    """Ghost-stat combine → running-stat updates for the span blocks,
    same (exact full-batch) combine as a single-pass BN would record."""
    mean, var = combine_ghost_stats(stats)      # (nblk, mid, 3)
    new = {}
    for i in range(1, reps):
        blk_new = {}
        for j, name in enumerate(("main_pw", "main_dw",
                                  "main_pw_linear")):
            old = bb_s[f"stage{stage}_{i}"][name]["bn"]
            blk_new[name] = {"bn": {
                "mean": (_MOMENTUM * old["mean"]
                         + (1 - _MOMENTUM) * mean[i - 1, :, j]),
                "var": (_MOMENTUM * old["var"]
                        + (1 - _MOMENTUM) * var[i - 1, :, j])}}
        new[f"stage{stage}_{i}"] = blk_new
    return new


def _s1_block_xla(x, p, s, dtype):
    """Stride-1 ShuffleV2 block, train mode, plain XLA (exact full-batch
    BN) — used for span stages where the Pallas kernel measured no win
    (see build_fused_train_apply's span_stages)."""
    new = {}
    xe, xo = x[..., 0::2], x[..., 1::2]
    y, new["main_pw"] = _convbn(xo, p["main_pw"], s["main_pw"], dtype)
    y, new["main_dw"] = _convbn(y, p["main_dw"], s["main_dw"], dtype,
                                groups=y.shape[-1], relu=False)
    y, new["main_pw_linear"] = _convbn(y, p["main_pw_linear"],
                                       s["main_pw_linear"], dtype)
    return jnp.concatenate([xe, y], -1), new


def build_fused_train_apply(input_hw: Tuple[int, int],
                            dtype=jnp.bfloat16,
                            interpret: bool = False,
                            input_format: str = "nhwc",
                            stem_group: int = None,
                            span_stages: Tuple[int, ...] = (2, 3, 4)):
    """Returns `apply_fn(params, batch_stats, images) ->
    (outputs 6-tuple, new_batch_stats)` — the fused-backbone train
    forward.

    input_format:
      * "nhwc"   — images (B, H, W, 3) uint8; /255 + XLA stem with exact
        full-batch BN.
      * "s2d_u8" — images (B, 48, pad128(H/4·W/4)) uint8 from
        `fastdet.kernels.fused_infer.pack_images_s2d` (host layout);
        the stem runs as the fused custom-VJP Pallas kernel
        (fastdet/kernels/stem_train.py: conv+ghost-BN+ReLU+pool forward
        and backward, /255 folded into the packed weights — the
        breakdown's single largest train cost).
    stem_group: ghost-BN group for the fused stem.  Default 1 — the
    single-pass per-image kernel (stats over one image's 4·(H/4·W/4)
    conv samples, ~31k/channel at 352²), which measured ~2× the grouped
    2-pass form; pass a larger divisor of B for group stats.
    span_stages: which backbone stages run their stride-1 spans as the
    Pallas custom-VJP kernels (others take exact-BN XLA blocks)."""
    if input_format not in ("nhwc", "s2d_u8"):
        raise ValueError(f"unknown input_format {input_format!r}")
    ih, iw = input_hw
    h4, w4 = ih // 4, iw // 4
    hw4 = h4 * w4
    npad4 = (hw4 + 127) // 128 * 128

    def apply_fn(params, batch_stats, images):
        b = images.shape[0]
        bb_p, bb_s = params["backbone"], batch_stats["backbone"]
        new_bb: Dict[str, Any] = {}

        if input_format == "s2d_u8":
            g = 1 if stem_group is None else stem_group
            stem_op = make_stem_train(h4, w4, npad4, g, dtype=dtype,
                                      interpret=interpret)
            fc = bb_p["first_conv"]
            wp = pack_stem_weights_traced(fc["conv"]["kernel"])
            gv = jnp.tile(fc["bn"]["scale"], 4)[:, None]
            bv = jnp.tile(fc["bn"]["bias"], 4)[:, None]
            y, stats = stem_op(images, wp, gv, bv)
            mean, var = combine_stem_stats(lax.stop_gradient(stats))
            old = bb_s["first_conv"]["bn"]
            new_bb["first_conv"] = {"bn": {
                "mean": _MOMENTUM * old["mean"] + (1 - _MOMENTUM) * mean,
                "var": _MOMENTUM * old["var"] + (1 - _MOMENTUM) * var}}
            x = (y[:, :, :hw4].transpose(0, 2, 1)
                 .reshape(b, h4, w4, 24))
        else:
            x = (images.astype(dtype)
                 / jnp.asarray(255.0, dtype))
            # stem: conv3x3 s2 + BN + ReLU + maxpool3x3 s2
            x, new_bb["first_conv"] = _convbn(x, bb_p["first_conv"],
                                              bb_s["first_conv"], dtype,
                                              stride=2)
            x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                                  (1, 2, 2, 1),
                                  [(0, 0), (1, 1), (1, 1), (0, 0)])

        feats = {}
        h, w = h4, w4
        for stage, reps, c in _STAGES:
            h, w = h // 2, w // 2
            hw = h * w
            nimg = (hw + 127) // 128 * 128
            x, new_bb[f"stage{stage}_0"] = _s2_block(
                x, bb_p[f"stage{stage}_0"], bb_s[f"stage{stage}_0"],
                dtype)
            if stage in span_stages:
                g = pick_train_group(b, nimg, c)
                span = make_span_train(reps - 1, h, w, nimg, c, g,
                                       dtype=dtype, interpret=interpret)
                ws = _pack_span_ws(bb_p, stage, reps, c)
                xt = x.reshape(b, hw, c)
                xt = jnp.pad(xt, ((0, 0), (0, nimg - hw), (0, 0)))
                xt = xt.transpose(0, 2, 1).reshape(b // g, g, c, nimg)
                xt = xt.transpose(0, 2, 1, 3).reshape(b // g, c,
                                                      g * nimg)
                out_t, stats = span(xt.astype(dtype), ws)
                new_bb.update(_span_stage_stats(
                    lax.stop_gradient(stats), bb_s, stage, reps))
                xu = (out_t.reshape(b // g, c, g, nimg)
                      .transpose(0, 2, 1, 3))
                x = (xu.reshape(b, c, nimg)[:, :, :hw]
                     .transpose(0, 2, 1).reshape(b, h, w, c))
            else:
                for i in range(1, reps):
                    x, new_bb[f"stage{stage}_{i}"] = _s1_block_xla(
                        x, bb_p[f"stage{stage}_{i}"],
                        bb_s[f"stage{stage}_{i}"], dtype)
            feats[stage] = x

        # FPN + shared heads (linen LightFPN / Detector semantics)
        fpn_p, fpn_s = params["fpn"], batch_stats["fpn"]
        new_fpn: Dict[str, Any] = {}
        C2, C3 = feats[3], feats[4]
        S3, new_fpn["conv1x1_3"] = _convbn(C3, fpn_p["conv1x1_3"],
                                           fpn_s["conv1x1_3"], dtype)
        up = jnp.repeat(jnp.repeat(C3, 2, axis=1), 2, axis=2)
        P2 = jnp.concatenate([up, C2], axis=-1)
        S2, new_fpn["conv1x1_2"] = _convbn(P2, fpn_p["conv1x1_2"],
                                           fpn_s["conv1x1_2"], dtype)
        heads = {}
        for s_, tag in ((S2, 2), (S3, 3)):
            for hname in (f"cls_head_{tag}", f"reg_head_{tag}"):
                heads[hname], new_fpn[hname] = _dwconvblock(
                    s_, fpn_p[hname], fpn_s[hname], dtype)

        def out_conv(x, name):
            p = params[name]
            return (x @ p["kernel"][0, 0].astype(dtype)
                    + p["bias"].astype(dtype))

        outs = []
        for tag in (2, 3):
            cls_f = heads[f"cls_head_{tag}"]
            reg_f = heads[f"reg_head_{tag}"]
            outs += [out_conv(reg_f, "output_reg"),
                     out_conv(cls_f, "output_obj"),
                     out_conv(cls_f, "output_cls")]
        reg2, obj2, cls2, reg3, obj3, cls3 = outs

        new_stats = {"backbone": new_bb, "fpn": new_fpn}
        return (reg2, obj2, cls2, reg3, obj3, cls3), new_stats

    return apply_fn
