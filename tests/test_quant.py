"""Int8 PTQ path: folded-float parity, weight-quant roundtrip, and
end-to-end detection agreement with the f32 model on the golden image.

Fills the evidence for the ncnn-int8 capability slot (the reference's
deploy runtime supports int8 conv; sample/ncnn/src/yolo-fastestv2.cpp
runs the exported net) — here the int8 graph is validated against the
f32 linen model it quantizes.
"""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from fastdet.models import Detector
from fastdet.ops.postprocess import postprocess
from fastdet.quant import (build_int8_forward, calibrate, fold_model,
                           forward_folded, quantize_weights)
from fastdet.quant.ptq import FloatOps
from tests.conftest import GOLDEN_IMG, requires_reference


@pytest.fixture(scope="module")
def golden_u8():
    ori = cv2.imread(GOLDEN_IMG)
    res = cv2.resize(ori, (352, 352), interpolation=cv2.INTER_LINEAR)
    return res[None].astype(np.uint8)          # (1,352,352,3) BGR


@requires_reference
def test_folded_float_matches_linen(ref_variables):
    """forward_folded(FloatOps) ≡ Detector.apply to folding precision,
    isolating any later int8 error to quantization alone."""
    model = Detector(classes=80, anchor_num=3)
    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, (2, 352, 352, 3), np.uint8)
    ref = model.apply(ref_variables, jnp.asarray(img, jnp.float32) / 255.0,
                      train=False)
    folded = fold_model(ref_variables)
    outs = forward_folded(jnp.asarray(img), FloatOps(folded))
    for i, (a, b) in enumerate(zip(ref, outs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   err_msg=f"output {i}")


@requires_reference
def test_weight_quant_roundtrip(ref_variables):
    """Per-out-channel symmetric int8: dequant error ≤ half a quant step
    on every element; scales positive; int8 range respected."""
    folded = fold_model(ref_variables)
    qw = quantize_weights(folded)
    assert set(qw) == set(folded)
    for name, q in qw.items():
        w = np.asarray(folded[name]["w"], np.float32)
        wq = np.asarray(q["wq"])
        sw = np.asarray(q["sw"])
        assert wq.dtype == np.int8 and np.all(np.abs(wq) <= 127)
        assert sw.shape == (w.shape[-1],) and np.all(sw > 0)
        err = np.abs(wq.astype(np.float32) * sw - w)
        assert np.all(err <= sw * 0.5 + 1e-8), name


@requires_reference
def test_calibration_covers_every_op(ref_variables, golden_u8):
    """calibrate() returns a strictly positive scale for every folded op
    (incl. the shared head convs, applied at both scales)."""
    folded = fold_model(ref_variables)
    scales = calibrate(folded, golden_u8)
    assert set(scales) == set(folded)
    assert all(v > 0 for v in scales.values())


def _greedy_match(det_a, det_b):
    """Greedy class-aware xyxy-IoU matching; returns per-match IoUs."""
    ious = []
    used = np.zeros(len(det_b), bool)
    for a in det_a:
        best, best_j = 0.0, -1
        for j, b in enumerate(det_b):
            if used[j] or int(a[5]) != int(b[5]):
                continue
            x1, y1 = max(a[0], b[0]), max(a[1], b[1])
            x2, y2 = min(a[2], b[2]), min(a[3], b[3])
            inter = max(x2 - x1, 0.0) * max(y2 - y1, 0.0)
            ua = ((a[2] - a[0]) * (a[3] - a[1])
                  + (b[2] - b[0]) * (b[3] - b[1]) - inter)
            iou = inter / ua if ua > 0 else 0.0
            if iou > best:
                best, best_j = iou, j
        if best_j >= 0:
            used[best_j] = True
            ious.append(best)
    return ious


@requires_reference
def test_int8_detections_match_f32(ref_variables, coco_cfg, golden_u8):
    """End-to-end: the int8 graph's golden-image detections agree with
    the f32 model's (same classes, IoU ≥ 0.7, count within ±1)."""
    # small calibration set: the image plus brightness variants, so the
    # activation ranges aren't tuned to a single exposure
    calib = np.concatenate([
        golden_u8,
        np.clip(golden_u8.astype(np.int32) * 3 // 4, 0, 255).astype(np.uint8),
        np.clip(golden_u8.astype(np.int32) * 5 // 4, 0, 255).astype(np.uint8),
    ])
    fwd_q, scales = build_int8_forward(ref_variables, calib)

    model = Detector(classes=80, anchor_num=3)
    outs_f = model.apply(
        ref_variables, jnp.asarray(golden_u8, jnp.float32) / 255.0,
        train=False)
    outs_q = fwd_q(jnp.asarray(golden_u8))

    anchors = jnp.asarray(
        np.asarray(coco_cfg.anchors, np.float32).reshape(2, 3, 2))
    det_f, n_f = postprocess(outs_f, anchors, (352, 352),
                             conf_thres=0.3, iou_thres=0.4)
    det_q, n_q = postprocess(outs_q, anchors, (352, 352),
                             conf_thres=0.3, iou_thres=0.4)
    n_f, n_q = int(n_f[0]), int(n_q[0])
    a = np.asarray(det_f[0][:n_f])
    b = np.asarray(det_q[0][:n_q])

    assert n_f > 0, "f32 path found nothing on the golden image"
    assert abs(n_f - n_q) <= 1, (n_f, n_q)
    ious = _greedy_match(a, b)
    assert len(ious) >= min(n_f, n_q) - 1
    assert all(i >= 0.7 for i in ious), ious
