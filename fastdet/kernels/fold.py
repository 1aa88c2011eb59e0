"""BN folding + weight packing for the fused Pallas inference path.

Folds every Conv+BN pair of the trained model into a single affine conv
(W' = W·γ/√(σ²+ε), b' = β − μ·γ/√(σ²+ε)) and packs the results in the
shapes the Pallas kernels consume:

  * pointwise convs   → (Cin, Cout) matrices
  * depthwise convs   → (kh, kw, C)
  * stride-1 shuffle blocks are packed for the TRANSPOSED (C, N) lane
    layout of the span kernels (fused_infer.py):
      - `wa` (C, C): one merged first matmul whose top half is the
        channel-de-interleave (odd select) folded into pw1, and whose
        bottom half is the even-channel passthrough selection — MXU
        M-utilisation doubles vs two half-height matmuls.
      - `wc` (C/2, 9·C/2): the depthwise 3×3 COMPOSED with pw2 into one
        full conv (legal because the reference has no ReLU between them,
        model/backbone/shufflenetv2.py: dw+BN directly into pw+BN+ReLU):
        wc[j, t·mid+c] = pw2[c,j]·dw_t[c].  Turns the VPU-bound dw taps
        into a single MXU matmul with a deep K (9·C/2).

All packing is host-side numpy, done once at build time.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

_EPS = 1e-5


def _fold(params: dict, stats: dict) -> Tuple[np.ndarray, np.ndarray]:
    """ConvBN submodule → (folded HWIO kernel, per-out-channel bias)."""
    w = np.asarray(params["conv"]["kernel"], np.float32)   # HWIO
    gamma = np.asarray(params["bn"]["scale"], np.float32)
    beta = np.asarray(params["bn"]["bias"], np.float32)
    mean = np.asarray(stats["bn"]["mean"], np.float32)
    var = np.asarray(stats["bn"]["var"], np.float32)
    s = gamma / np.sqrt(var + _EPS)
    return w * s, beta - mean * s


def _fold_pw(params, stats) -> Tuple[np.ndarray, np.ndarray]:
    w, b = _fold(params, stats)          # (1,1,Cin,Cout)
    return w[0, 0], b                    # (Cin, Cout)


def _fold_dw(params, stats) -> Tuple[np.ndarray, np.ndarray]:
    w, b = _fold(params, stats)          # (kh,kw,1,C)
    return w[:, :, 0, :], b              # (kh,kw,C)


def _sel_odd(c: int) -> np.ndarray:
    s = np.zeros((c, c // 2), np.float32)
    s[np.arange(1, c, 2), np.arange(c // 2)] = 1.0
    return s


def pack_s1_block(params: dict, stats: dict, c: int) -> Dict[str, np.ndarray]:
    """Stride-1 ShuffleV2 block → transposed-layout fused weights.

    Channel semantics folded in: even channels pass through to output
    rows [0, c/2) (the bottom half of `wa`); the main branch consumes
    odd channels (top half of `wa` = sel_odd∘pw1) and lands at output
    rows [c/2, c) as `wc @ taps(relu(wa@x))`.
    """
    mid = c // 2
    w1, b1 = _fold_pw(params["main_pw"], stats["main_pw"])   # (c, mid)
    wd, bd = _fold_dw(params["main_dw"], stats["main_dw"])   # (3,3,mid)
    w2, b2 = _fold_pw(params["main_pw_linear"], stats["main_pw_linear"])
    w1 = _sel_odd(c) @ w1                                    # (c, mid)
    sel_even = np.zeros((mid, c), np.float32)
    sel_even[np.arange(mid), np.arange(0, c, 2)] = 1.0
    wa = np.concatenate([w1.T, sel_even], 0)                 # (c, c)
    ba = np.concatenate([b1, np.zeros(mid, np.float32)])
    # dw3x3 ∘ pw2 composed: no ReLU between them in the reference
    wc = np.zeros((mid, 9 * mid), np.float32)
    for t in range(9):
        dy, dx = t // 3, t % 3
        wc[:, t * mid:(t + 1) * mid] = w2.T * wd[dy, dx][None, :]
    bc = w2.T @ bd + b2
    return {"wa": wa, "ba": ba, "wc": wc, "bc": bc}


def pack_s2_block(params: dict, stats: dict, cin: int, cout: int
                  ) -> Dict[str, np.ndarray]:
    """Stride-2 ShuffleV2 block (runs in XLA — strided spatial subsampling
    has no efficient lane addressing in Mosaic)."""
    w1, b1 = _fold_pw(params["main_pw"], stats["main_pw"])
    wd, bd = _fold_dw(params["main_dw"], stats["main_dw"])
    w2, b2 = _fold_pw(params["main_pw_linear"], stats["main_pw_linear"])
    wpd, bpd = _fold_dw(params["proj_dw"], stats["proj_dw"])
    wpp, bpp = _fold_pw(params["proj_pw"], stats["proj_pw"])
    return {"w1": w1, "b1": b1, "wd": wd, "bd": bd, "w2": w2, "b2": b2,
            "wpd": wpd, "bpd": bpd, "wpp": wpp, "bpp": bpp}


def pack_s2_block_fused(params: dict, stats: dict, cin: int, cout: int
                        ) -> Dict[str, np.ndarray]:
    """Stride-2 ShuffleV2 block packed for the PHASE-PACKED Pallas
    prologue (fused_infer._s2span_kernel).

    Input layout there: (4·cin, N) — the four spatial phases
    p = (y%2)·2 + (x%2) of the stage's input grid stacked phase-major on
    sublanes, lanes the stride-2 OUTPUT grid.  In that layout every
    stride-2 conv tap is a coarse lane roll from a statically chosen
    phase plane (the space-to-depth trick the fused stem uses), so the
    whole block runs as matmuls + rolls — no strided lane addressing.

      * `wa_blk` (4·mid, 4·cin): pw1 applied per phase as one
        block-diagonal matmul (the same folded pw1 on each diagonal
        block — a 1×1 conv is phase-independent).
      * `wc` (mid, 9·mid): dw3×3(s2) ∘ pw2 composed (no ReLU between,
        reference shufflenetv2.py:25-32), tap-major K.
      * `wp` (mid, 9·cin): proj dw3×3(s2) ∘ proj pw composed (same
        no-ReLU structure on the projection branch,
        shufflenetv2.py:34-44).
    """
    mid = cout // 2
    w1, b1 = _fold_pw(params["main_pw"], stats["main_pw"])     # (cin, mid)
    wd, bd = _fold_dw(params["main_dw"], stats["main_dw"])     # (3,3,mid)
    w2, b2 = _fold_pw(params["main_pw_linear"], stats["main_pw_linear"])
    wpd, bpd = _fold_dw(params["proj_dw"], stats["proj_dw"])   # (3,3,cin)
    wpp, bpp = _fold_pw(params["proj_pw"], stats["proj_pw"])   # (cin, mid)

    wa_blk = np.zeros((4 * mid, 4 * cin), np.float32)
    for p in range(4):
        wa_blk[p * mid:(p + 1) * mid, p * cin:(p + 1) * cin] = w1.T
    ba_blk = np.tile(b1, 4)

    wc = np.zeros((mid, 9 * mid), np.float32)
    wp = np.zeros((mid, 9 * cin), np.float32)
    for t in range(9):
        dy, dx = t // 3 - 1, t % 3 - 1
        wc[:, t * mid:(t + 1) * mid] = w2.T * wd[dy + 1, dx + 1][None, :]
        wp[:, t * cin:(t + 1) * cin] = wpp.T * wpd[dy + 1, dx + 1][None, :]
    bc = w2.T @ bd + b2
    bp = wpp.T @ bpd + bpp
    return {"wa": wa_blk, "ba": ba_blk, "wc": wc, "bc": bc,
            "wp": wp, "bp": bp}


def pack_dwconvblock(params: dict, stats: dict) -> Dict[str, np.ndarray]:
    """Head DWConvBlock: dw5 + pw + dw5 + pw (second pw un-ReLU'd)."""
    out = {}
    for name in ("dw1", "pw1", "dw2", "pw2"):
        if name.startswith("dw"):
            w, b = _fold_dw(params[name], stats[name])
        else:
            w, b = _fold_pw(params[name], stats[name])
        out[f"{name}_w"] = w
        out[f"{name}_b"] = b
    return out


def pack_convbn_pw(params: dict, stats: dict) -> Dict[str, np.ndarray]:
    w, b = _fold_pw(params, stats)
    return {"w": w, "b": b}


def pack_head_conv(params: dict) -> Dict[str, np.ndarray]:
    """Plain 1×1 conv with bias (detector output heads, no BN)."""
    return {"w": np.asarray(params["kernel"], np.float32)[0, 0],
            "b": np.asarray(params["bias"], np.float32)}


def _pack_backbone(packed: Dict[str, Any], bb_p: dict, bb_s: dict) -> None:
    """Shared ShuffleNetV2 packing (stem + stride-2 blocks + spans) —
    used by both model families (they share the backbone)."""
    # stem (3×3 s2 conv stays HWIO for lax.conv) + stride-2 blocks
    w, b = _fold(bb_p["first_conv"], bb_s["first_conv"])
    packed["stem_w"] = w
    packed["stem_b"] = b
    stage_cin = {2: 24, 3: 48, 4: 96}
    for stage, cout in ((2, 48), (3, 96), (4, 192)):
        blk = pack_s2_block(bb_p[f"stage{stage}_0"], bb_s[f"stage{stage}_0"],
                            stage_cin[stage], cout)
        for k, v in blk.items():
            packed[f"s{stage}_0_{k}"] = v
        blkf = pack_s2_block_fused(bb_p[f"stage{stage}_0"],
                                   bb_s[f"stage{stage}_0"],
                                   stage_cin[stage], cout)
        for k, v in blkf.items():
            packed[f"s{stage}_0f_{k}"] = v

    # stride-1 spans of each stage (block 0 of each stage is stride-2)
    stage_channels = {2: 48, 3: 96, 4: 192}
    stage_repeats = {2: 4, 3: 8, 4: 4}
    for stage, reps in stage_repeats.items():
        c = stage_channels[stage]
        for i in range(1, reps):
            blk = pack_s1_block(bb_p[f"stage{stage}_{i}"],
                                bb_s[f"stage{stage}_{i}"], c)
            for k, v in blk.items():
                packed[f"s{stage}_{i}_{k}"] = v


def pack_fused_weights(variables: dict, dtype=np.float32) -> Dict[str, Any]:
    """Pack everything the fused inference path needs from a variables
    pytree.  Returns a flat dict of numpy arrays (a valid jit argument
    pytree — weights are ALWAYS runtime args, never baked constants)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    packed: Dict[str, Any] = {}
    _pack_backbone(packed, params["backbone"], stats["backbone"])

    fpn_p, fpn_s = params["fpn"], stats["fpn"]
    for name in ("conv1x1_2", "conv1x1_3"):
        pw = pack_convbn_pw(fpn_p[name], fpn_s[name])
        packed[f"{name}_w"] = pw["w"]
        packed[f"{name}_b"] = pw["b"]
    for head in ("cls_head_2", "reg_head_2", "cls_head_3", "reg_head_3"):
        blk = pack_dwconvblock(fpn_p[head], fpn_s[head])
        for k, v in blk.items():
            packed[f"{head}_{k}"] = v

    for out in ("output_reg", "output_obj", "output_cls"):
        hc = pack_head_conv(params[out])
        packed[f"{out}_w"] = hc["w"]
        packed[f"{out}_b"] = hc["b"]

    if dtype is not np.float32:
        packed = {k: v.astype(dtype) for k, v in packed.items()}
    return packed


def pack_fused_weights_af(variables: dict, dtype=np.float32
                          ) -> Dict[str, Any]:
    """Anchor-free family (models/anchorfree.py): same backbone packing,
    then the single-scale fuse ConvBN + decoupled DWConvBlock heads +
    three bias'd 1×1 output convs."""
    params = variables["params"]
    stats = variables["batch_stats"]
    packed: Dict[str, Any] = {}
    _pack_backbone(packed, params["backbone"], stats["backbone"])

    pw = pack_convbn_pw(params["fuse"], stats["fuse"])
    packed["fuse_w"] = pw["w"]
    packed["fuse_b"] = pw["b"]
    for head in ("head_cls", "head_reg"):
        blk = pack_dwconvblock(params[head], stats[head])
        for k, v in blk.items():
            packed[f"{head}_{k}"] = v
    for out in ("out_obj", "out_cls", "out_reg"):
        hc = pack_head_conv(params[out])
        packed[f"{out}_w"] = hc["w"]
        packed[f"{out}_b"] = hc["b"]

    if dtype is not np.float32:
        packed = {k: v.astype(dtype) for k, v in packed.items()}
    return packed
