"""Int8 post-training quantization (PTQ) of the Yolo-FastestV2 detector.

The deploy-mode model is first folded to a flat affine-conv graph (every
Conv+BN pair → one conv with bias, reusing `fastdet.kernels.fold`), then
each conv runs as an integer contraction:

  * weights: symmetric per-OUTPUT-CHANNEL int8 (`w ≈ s_w[c] · w_q`),
    the granularity ncnn's int8 path uses for conv weights;
  * activations: symmetric per-TENSOR int8 (`x ≈ s_x · x_q`) with
    scales calibrated over a calibration set — by default an
    outlier-robust percentile clip of the |x| histogram (p99.99;
    the role of ncnn's calibration-table step), optionally plain
    max-|x| (`calibrate(method=...)`);
  * pointwise convs contract the int8 operands on the MXU; the MAC
    unit is selectable (`QuantOps(mac=...)`): "bf16" (default) casts
    the int8 operands to bf16 and accumulates f32 — bitwise equal to
    int32 accumulation for this net's contraction widths, and stable
    on the axon-relay v5e where the native int8×int8→int32
    `preferred_element_type` lowering intermittently faults the TPU
    worker (see the QuantOps docstring); "int32" keeps the native
    integer matmul.  Depthwise and the 3×3 stem conv accumulate tap
    products elementwise (VPU work either way);
  * between ops the int32 accumulator is rescaled to f32
    (`y = acc · s_x·s_w + b`), ReLU'd, and re-quantized by the next
    op's calibrated scale — the standard dequant/requant PTQ
    formulation, which keeps every scale explicit and testable.

Structure mirrors the eval-mode `fastdet.models.Detector` exactly
(capability parity with reference model/detector.py:7-47 via the same
module tree); `forward_folded` with `FloatOps` reproduces the linen
forward to ≤5e-4 (pinned by tests/test_quant.py), so the int8 error is
attributable to quantization alone.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from fastdet.kernels.fold import _fold

_STAGE_CHANNELS = {2: 48, 3: 96, 4: 192}
_STAGE_REPEATS = ((2, 4), (3, 8), (4, 4))


# ------------------------------------------------------------- folding

def fold_model(variables: dict) -> Dict[str, Dict[str, np.ndarray]]:
    """All Conv+BN pairs folded to {name: {"w", "b"}} (HWIO kernels,
    per-out-channel bias) + the bias'd 1×1 head convs.

    Handles both families by param-tree shape: the anchor-based Detector
    (backbone + fpn + output_* heads) and the anchor-free family
    (backbone + fuse + head_cls/head_reg + out_* heads); the family is
    recoverable from the folded names (`infer_family`)."""
    p = variables["params"]
    s = variables["batch_stats"]
    out: Dict[str, Dict[str, np.ndarray]] = {}

    def walk(pp, ss, prefix):
        if "conv" in pp and "bn" in pp:
            w, b = _fold(pp, ss)
            out[prefix] = {"w": np.asarray(w), "b": np.asarray(b)}
            return
        for k in pp:
            walk(pp[k], ss.get(k, {}), f"{prefix}/{k}")

    def head(name):
        out[name] = {"w": np.asarray(p[name]["kernel"], np.float32),
                     "b": np.asarray(p[name]["bias"], np.float32)}

    walk(p["backbone"], s["backbone"], "backbone")
    if "fpn" in p:                                  # anchor-based family
        walk(p["fpn"], s["fpn"], "fpn")
        for h in ("output_reg", "output_obj", "output_cls"):
            head(h)
    else:                                           # anchor-free family
        for mod in ("fuse", "head_cls", "head_reg"):
            walk(p[mod], s[mod], mod)
        for h in ("out_obj", "out_cls", "out_reg"):
            head(h)
    return out


def infer_family(folded_or_qw) -> str:
    """Family from the folded/quantized op names (also how the .npz
    artifact self-describes)."""
    return "anchorfree" if "fuse" in folded_or_qw else "yolo-fastestv2"


# ------------------------------------------------------------- op sets

class FloatOps:
    """f32 ops on the folded graph; optionally records per-op input
    max-|x| (the calibration pass)."""

    def __init__(self, folded, record: bool = False):
        self.fw = folded
        self.record = record
        self.maxabs: Dict[str, jnp.ndarray] = {}

    def _rec(self, name, x):
        if self.record:
            m = jnp.max(jnp.abs(x))
            if name in self.maxabs:        # shared head convs: both sites
                m = jnp.maximum(m, self.maxabs[name])
            self.maxabs[name] = m

    def conv(self, name, x, stride, relu):
        q = self.fw[name]
        self._rec(name, x)
        y = lax.conv_general_dilated(
            x, jnp.asarray(q["w"]), (stride, stride),
            [(q["w"].shape[0] // 2,) * 2, (q["w"].shape[1] // 2,) * 2],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + jnp.asarray(q["b"])
        return jnp.maximum(y, 0.0) if relu else y

    def dw(self, name, x, stride, relu):
        q = self.fw[name]
        self._rec(name, x)
        c = x.shape[-1]
        y = lax.conv_general_dilated(
            x, jnp.asarray(q["w"]), (stride, stride),
            [(q["w"].shape[0] // 2,) * 2, (q["w"].shape[1] // 2,) * 2],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)
        y = y + jnp.asarray(q["b"])
        return jnp.maximum(y, 0.0) if relu else y

    def pw(self, name, x, relu):
        q = self.fw[name]
        self._rec(name, x)
        y = x @ jnp.asarray(q["w"][0, 0]) + jnp.asarray(q["b"])
        return jnp.maximum(y, 0.0) if relu else y


def _quant_in(x, scale):
    return jnp.clip(jnp.round(x * (1.0 / scale)), -127, 127
                    ).astype(jnp.int8)


class QuantOps:
    """int8 ops: per-tensor activation scales (calibrated), per-channel
    weight scales, integer-exact accumulation.

    `float_names`: ops run in f32 on the DEQUANTIZED weights (wq·sw —
    within ½ quant step of the folded f32 kernel) with no activation
    quantization — the mixed-precision escape hatch for layers whose
    activation quantization hurts (e.g. the output logit convs).

    `mac`: which functional unit carries the int8 contractions.
      * "bf16" (default): int8 operands cast to bf16, MXU matmul with
        f32 accumulation.  BITWISE EQUAL to int32 accumulation for this
        net: ±127 operands are exact in bf16, each product (≤127²) is
        exact in the f32 multiply, and every partial sum stays an
        integer < 2²⁴ (widest contraction here is K=192 taps×channels →
        |acc| ≤ 192·127² ≈ 3.1M), so f32 adds never round.  Pinned
        equal to the int32 path by tests/test_quant.py.
      * "int32": int8×int8→int32 `preferred_element_type` dot_generals
        — the MXU's native integer matmul.  On the axon-relay v5e this
        lowering intermittently FAULTS the TPU worker process
        ("UNAVAILABLE: TPU worker process crashed", r3/r4 bench + 8
        isolated repros, while the same program passes occasionally);
        plain int8 dot chains in isolation are stable, so the fault
        needs the full conv graph around it.  Kept for parity testing
        on CPU and for platforms where the native path is sound."""

    def __init__(self, qw, scales: Dict[str, float],
                 float_names=frozenset(), mac: str = "bf16"):
        if mac not in ("bf16", "int32"):
            raise ValueError(f"unknown mac {mac!r}")
        self.qw = qw
        self.scales = scales
        self.float_names = frozenset(float_names)
        self.mac = mac

    def _deq(self, q):
        return q["wq"].astype(jnp.float32) * q["sw"]

    def _taps_conv(self, name, x, stride, relu, groups):
        q = self.qw[name]
        if name in self.float_names:
            kh, kw = q["wq"].shape[:2]
            y = lax.conv_general_dilated(
                x, self._deq(q), (stride, stride),
                [(kh // 2,) * 2, (kw // 2,) * 2],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups) + q["b"]
            return jnp.maximum(y, 0.0) if relu else y
        sx = self.scales[name]
        xq = _quant_in(x, sx)
        kh, kw = q["wq"].shape[:2]
        ph, pw_ = kh // 2, kw // 2
        # operand dtypes per MAC unit (see class docstring; both exact)
        in_t, acc_t = ((jnp.bfloat16, jnp.float32) if self.mac == "bf16"
                       else (jnp.int32, jnp.int32))
        xp = jnp.pad(xq, ((0, 0), (ph, ph), (pw_, pw_), (0, 0))
                     ).astype(in_t)
        oh = (x.shape[1] + 2 * ph - kh) // stride + 1
        ow = (x.shape[2] + 2 * pw_ - kw) // stride + 1
        acc = None
        for dy in range(kh):
            for dx in range(kw):
                sl = xp[:, dy:dy + stride * oh:stride,
                        dx:dx + stride * ow:stride, :]
                wq_t = q["wq"][dy, dx].astype(in_t)        # (Cin/g, Cout)
                if groups == 1:
                    t = lax.dot_general(
                        sl, wq_t, (((3,), (0,)), ((), ())),
                        preferred_element_type=acc_t)
                else:                                      # depthwise
                    t = (sl.astype(acc_t)
                         * wq_t[0].astype(acc_t)[None, None, None, :])
                acc = t if acc is None else acc + t
        y = acc.astype(jnp.float32) * (sx * q["sw"]) + q["b"]
        return jnp.maximum(y, 0.0) if relu else y

    def conv(self, name, x, stride, relu):
        return self._taps_conv(name, x, stride, relu, groups=1)

    def dw(self, name, x, stride, relu):
        return self._taps_conv(name, x, stride, relu,
                               groups=x.shape[-1])

    def pw(self, name, x, relu):
        q = self.qw[name]
        if name in self.float_names:
            y = x @ self._deq(q)[0, 0] + q["b"]
            return jnp.maximum(y, 0.0) if relu else y
        sx = self.scales[name]
        xq = _quant_in(x, sx)
        in_t, acc_t = ((jnp.bfloat16, jnp.float32) if self.mac == "bf16"
                       else (jnp.int8, jnp.int32))
        y = lax.dot_general(xq.astype(in_t), q["wq"][0, 0].astype(in_t),
                            (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=acc_t)
        y = y.astype(jnp.float32) * (sx * q["sw"]) + q["b"]
        return jnp.maximum(y, 0.0) if relu else y


def quantize_weights(folded) -> Dict[str, Dict[str, Any]]:
    """Per-output-channel symmetric int8: wq int8 HWIO, sw (Cout,) f32."""
    out = {}
    for name, q in folded.items():
        w = np.asarray(q["w"], np.float32)
        sw = np.maximum(np.abs(w).reshape(-1, w.shape[-1]).max(0),
                        1e-12) / 127.0
        wq = np.clip(np.round(w / sw), -127, 127).astype(np.int8)
        out[name] = {"wq": jnp.asarray(wq),
                     "sw": jnp.asarray(sw.astype(np.float32)),
                     "b": jnp.asarray(np.asarray(q["b"], np.float32))}
    return out


# ----------------------------------------------------- shared structure

def _maxpool(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                             (1, 2, 2, 1),
                             [(0, 0), (1, 1), (1, 1), (0, 0)])


def _upsample2x(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def _backbone_folded(images_u8, ops) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared ShuffleNetV2 folded forward → (C2 stride-16, C3 stride-32)."""
    x = images_u8.astype(jnp.float32) / 255.0
    y = ops.conv("backbone/first_conv", x, stride=2, relu=True)
    y = _maxpool(y)

    feats = []
    for sid, reps in _STAGE_REPEATS:
        for i in range(reps):
            nm = f"backbone/stage{sid}_{i}"
            if i == 0:
                proj = ops.dw(f"{nm}/proj_dw", y, stride=2, relu=False)
                proj = ops.pw(f"{nm}/proj_pw", proj, relu=True)
                m = ops.pw(f"{nm}/main_pw", y, relu=True)
                m = ops.dw(f"{nm}/main_dw", m, stride=2, relu=False)
                m = ops.pw(f"{nm}/main_pw_linear", m, relu=True)
                y = jnp.concatenate([proj, m], axis=-1)
            else:
                x_proj, x_main = y[..., 0::2], y[..., 1::2]
                m = ops.pw(f"{nm}/main_pw", x_main, relu=True)
                m = ops.dw(f"{nm}/main_dw", m, stride=1, relu=False)
                m = ops.pw(f"{nm}/main_pw_linear", m, relu=True)
                y = jnp.concatenate([x_proj, m], axis=-1)
        feats.append(y)
    return feats[1], feats[2]


def _dwblock_folded(ops, nm, s):
    t = ops.dw(f"{nm}/dw1", s, stride=1, relu=True)
    t = ops.pw(f"{nm}/pw1", t, relu=False)
    t = ops.dw(f"{nm}/dw2", t, stride=1, relu=True)
    t = ops.pw(f"{nm}/pw2", t, relu=False)
    return t


def forward_folded(images_u8, ops) -> Tuple[jnp.ndarray, ...]:
    """Eval-mode forward on the folded graph (mirrors Detector exactly;
    reference model/detector.py:32-47 call order).  `images_u8` NHWC
    uint8; returns the raw-logit 6-tuple."""
    C2, C3 = _backbone_folded(images_u8, ops)

    def dwblock(nm, s):
        return _dwblock_folded(ops, nm, s)

    S3 = ops.pw("fpn/conv1x1_3", C3, relu=True)
    cls3 = dwblock("fpn/cls_head_3", S3)
    reg3 = dwblock("fpn/reg_head_3", S3)
    P2 = jnp.concatenate([_upsample2x(C3), C2], axis=-1)
    S2 = ops.pw("fpn/conv1x1_2", P2, relu=True)
    cls2 = dwblock("fpn/cls_head_2", S2)
    reg2 = dwblock("fpn/reg_head_2", S2)

    return (ops.pw("output_reg", reg2, relu=False),
            ops.pw("output_obj", cls2, relu=False),
            ops.pw("output_cls", cls2, relu=False),
            ops.pw("output_reg", reg3, relu=False),
            ops.pw("output_obj", cls3, relu=False),
            ops.pw("output_cls", cls3, relu=False))


def forward_folded_af(images_u8, ops) -> Tuple[jnp.ndarray, ...]:
    """Anchor-free folded forward (mirrors AnchorFreeDetector,
    models/anchorfree.py:45-72): single stride-16 scale → raw-logit
    (obj, cls, reg) 3-tuple."""
    C2, C3 = _backbone_folded(images_u8, ops)
    P = jnp.concatenate([C2, _upsample2x(C3)], axis=-1)
    S = ops.pw("fuse", P, relu=True)
    feat_cls = _dwblock_folded(ops, "head_cls", S)
    feat_reg = _dwblock_folded(ops, "head_reg", S)
    return (ops.pw("out_obj", feat_cls, relu=False),
            ops.pw("out_cls", feat_cls, relu=False),
            ops.pw("out_reg", feat_reg, relu=False))


def folded_forward_for(folded_or_qw):
    """The family-correct folded forward fn for a folded/quantized dict."""
    return (forward_folded_af if infer_family(folded_or_qw) == "anchorfree"
            else forward_folded)


# --------------------------------------------------------- calibration

def calibrate(folded, calib_images_u8, batch: int = 8,
              method: str = "percentile", percentile: float = 0.9999,
              bins: int = 2048) -> Dict[str, float]:
    """Per-op activation scales over the calibration set.

    method="percentile" (default): two passes — a max-|x| scan fixing
    each op's histogram range, then a `bins`-bin |x| histogram whose
    `percentile` point becomes the clip threshold (scale = thr/127).
    Outlier-robust: measured int8-vs-f32 detection mAP 0.98 at p99.99 vs
    0.71 for plain max on the derived set (the role of ncnn's entropy
    calibration-table step in the reference's int8 deploy chain).
    method="max": single max-|x| pass (the naive baseline).

    Head convs are applied at both scales with shared weights (reference
    detector.py:25-31), so their statistics pool both application sites.

    The folded weights enter the programs as RUNTIME ARGUMENTS, never as
    closed-over jit constants — constant-baking a conv graph's weights
    causes multi-minute XLA compiles (and permanently degraded dispatch
    on the axon backend; same rule as fused_infer.py's packed args).
    """
    fw_dev = jax.tree.map(jnp.asarray, dict(folded))
    fwd = folded_forward_for(folded)

    @jax.jit
    def max_pass(imgs, fw):
        ops = FloatOps(fw, record=True)
        fwd(imgs, ops)
        return dict(ops.maxabs)

    maxes: Dict[str, float] = {}
    n = len(calib_images_u8)
    for i in range(0, n, batch):
        chunk = jnp.asarray(calib_images_u8[i:i + batch])
        m = jax.device_get(max_pass(chunk, fw_dev))
        for k, v in m.items():
            maxes[k] = max(maxes.get(k, 0.0), float(v))

    if method == "max":
        # scale = max|x|/127 so x_q = round(x/scale) spans the int8
        # range; guard degenerate all-zero taps
        return {k: (v / 127.0 if v > 0 else 1.0)
                for k, v in maxes.items()}
    if method != "percentile":
        raise ValueError(f"unknown calibration method {method!r}")

    @jax.jit
    def hist_pass(imgs, fw):
        ops = _HistOps(fw, maxes, bins)
        fwd(imgs, ops)
        return dict(ops.hists)

    hists = {k: np.zeros(bins, np.int64) for k in maxes}
    for i in range(0, n, batch):
        chunk = jnp.asarray(calib_images_u8[i:i + batch])
        m = jax.device_get(hist_pass(chunk, fw_dev))
        for k, v in m.items():
            hists[k] += np.asarray(v, np.int64)

    scales: Dict[str, float] = {}
    for k, mx in maxes.items():
        if mx <= 0:
            scales[k] = 1.0
            continue
        c = np.cumsum(hists[k])
        i = int(np.searchsorted(c, c[-1] * percentile))
        thr = (i + 0.5) / bins * mx
        scales[k] = max(thr, 1e-8) / 127.0
    return scales


class _HistOps(FloatOps):
    """FloatOps that accumulates a fixed-range |x| histogram per op
    (ranges from a prior max pass; shared-weight ops pool both sites)."""

    def __init__(self, fw, maxes: Dict[str, float], bins: int):
        super().__init__(fw, record=False)
        self.maxes = maxes
        self.bins = bins
        self.hists: Dict[str, jnp.ndarray] = {}

    def _rec(self, name, x):
        h = jnp.histogram(jnp.abs(x), bins=self.bins,
                          range=(0.0, max(self.maxes[name], 1e-12)))[0]
        self.hists[name] = self.hists.get(name, 0) + h


def build_int8_forward(variables: dict, calib_images_u8,
                       ) -> Tuple[Callable, Dict[str, float]]:
    """→ (forward(images_u8) → raw-logit 6-tuple, activation scales).

    The returned forward is jit-compatible and drop-in compatible with
    `Detector.apply(..., train=False)` / `build_fused_forward` outputs,
    so the standard `fastdet.ops.postprocess` chain runs unchanged on
    the int8 logits.
    """
    folded = fold_model(variables)
    scales = calibrate(folded, calib_images_u8)
    qw = quantize_weights(folded)
    return forward_from(qw, scales), scales


def forward_from(qw, scales: Dict[str, float],
                 mac: str = "bf16") -> Callable:
    """Int8 forward from already-quantized weights + activation scales.

    The returned `forward(images_u8, weights=None)` takes the quantized
    weight pytree as an OPTIONAL runtime argument: jit call sites must
    pass it (`jax.jit(lambda im, w: fwd(im, w))(imgs, qw)`) so the
    weights are program arguments, not baked constants — closing over
    them inside jit causes multi-minute compiles on conv graphs (axon
    gotcha; the activation scales are python floats and stay static).
    """
    qdev = jax.tree.map(jnp.asarray, {k: dict(v) for k, v in qw.items()})
    fwd = folded_forward_for(qw)

    def forward(images_u8, weights=None):
        return fwd(
            images_u8, QuantOps(qdev if weights is None else weights,
                                scales, mac=mac))

    return forward


# ------------------------------------------------------------- artifact

def save_quantized(path: str, qw, scales: Dict[str, float]) -> None:
    """One .npz: per-op int8 kernels, weight scales, biases, and the
    calibrated activation scale (the ncnn-int8 'calibration table' role,
    weights included)."""
    flat: Dict[str, np.ndarray] = {}
    for name, q in qw.items():
        flat[f"{name}|wq"] = np.asarray(q["wq"], np.int8)
        flat[f"{name}|sw"] = np.asarray(q["sw"], np.float32)
        flat[f"{name}|b"] = np.asarray(q["b"], np.float32)
        # float64 so the roundtrip is exact (the scale is host-side
        # python float; it enters the graph only via f32 products)
        flat[f"{name}|sx"] = np.float64(scales[name])
    np.savez(path, **flat)


def load_quantized(path: str) -> Tuple[Dict[str, Dict[str, Any]],
                                       Dict[str, float]]:
    """Inverse of `save_quantized` → (qw, scales)."""
    with np.load(path) as z:
        qw: Dict[str, Dict[str, Any]] = {}
        scales: Dict[str, float] = {}
        for key in z.files:
            name, kind = key.rsplit("|", 1)
            if kind == "sx":
                scales[name] = float(z[key])
            else:
                qw.setdefault(name, {})[
                    {"wq": "wq", "sw": "sw", "b": "b"}[kind]
                ] = jnp.asarray(z[key])
    return qw, scales
