"""Decode + NMS parity vs the reference postprocess chain, incl. the
golden-image end-to-end check on img/000139.jpg."""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from fastdet.models import Detector
from fastdet.ops.decode import decode_outputs
from fastdet.ops.nms import batched_nms
from fastdet.ops.postprocess import build_detect_fn
from tests.conftest import GOLDEN_IMG, requires_reference


@pytest.fixture(scope="module")
def golden_batch(coco_cfg):
    ori = cv2.imread(GOLDEN_IMG)
    res = cv2.resize(ori, (coco_cfg.width, coco_cfg.height),
                     interpolation=cv2.INTER_LINEAR)
    return res[None]  # (1,H,W,3) uint8 BGR


@requires_reference
def test_decode_parity(ref_variables, torch_model, torch_ref, coco_cfg,
                       golden_batch):
    """Our batched decode equals the reference handel_preds python loop."""
    torch = torch_ref.torch
    x = golden_batch.astype(np.float32) / 255.0
    with torch.no_grad():
        preds = torch_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref_out = torch_ref.utils.handel_preds(preds, coco_cfg.to_dict(), "cpu")

    model = Detector(classes=80, anchor_num=3)
    outs = model.apply(ref_variables, jnp.asarray(x), train=False)
    anchors = jnp.asarray(
        np.asarray(coco_cfg.anchors, np.float32).reshape(2, 3, 2))
    dec = decode_outputs(outs, anchors, (352, 352))
    assert dec.shape == ref_out.shape  # (1, 1815, 85)
    np.testing.assert_allclose(np.asarray(dec), ref_out.numpy(), atol=2e-3)


@requires_reference
def test_golden_image_detections(ref_variables, torch_model, torch_ref,
                                 coco_cfg, golden_batch):
    """End-to-end: image → boxes matches the full reference chain."""
    torch = torch_ref.torch
    x = golden_batch.astype(np.float32) / 255.0
    with torch.no_grad():
        preds = torch_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref_out = torch_ref.utils.handel_preds(preds, coco_cfg.to_dict(), "cpu")
    ref_boxes = torch_ref.utils.non_max_suppression(
        ref_out, conf_thres=0.3, iou_thres=0.4)[0].numpy()

    model = Detector(classes=80, anchor_num=3)
    detect = build_detect_fn(model, coco_cfg, conf_thres=0.3, iou_thres=0.4)
    dets, counts = detect(ref_variables, jnp.asarray(golden_batch))
    n = int(counts[0])
    assert n == len(ref_boxes)
    np.testing.assert_allclose(np.asarray(dets[0, :n]), ref_boxes,
                               atol=5e-2)


def test_nms_semantics_random():
    """Fixed-shape NMS equals a greedy numpy reference on random boxes."""
    rng = np.random.RandomState(7)
    n, nc = 200, 5
    cxy = rng.rand(n, 2).astype(np.float32) * 300
    wh = rng.rand(n, 2).astype(np.float32) * 80 + 5
    boxes = np.concatenate([cxy, wh], -1)
    obj = rng.rand(n).astype(np.float32)
    cls = rng.rand(n, nc).astype(np.float32)
    cls /= cls.sum(-1, keepdims=True)

    conf_thres, iou_thres = 0.25, 0.45
    dets, count = batched_nms(jnp.asarray(boxes[None]), jnp.asarray(obj[None]),
                              jnp.asarray(cls[None]), conf_thres=conf_thres,
                              iou_thres=iou_thres, max_det=50, max_nms=256)
    dets, count = np.asarray(dets[0]), int(count[0])

    # numpy reference (reference utils/utils.py:232-296 semantics)
    conf = cls * obj[:, None]
    best = conf.max(-1)
    j = conf.argmax(-1)
    valid = (obj > conf_thres) & (best > conf_thres)
    xyxy = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1)
    idx = np.where(valid)[0]
    idx = idx[np.argsort(-best[idx], kind="stable")]
    keep = []
    sup = set()
    for i in idx:
        if i in sup:
            continue
        keep.append(i)
        for k in idx:
            if k in sup or k == i or j[k] != j[i]:
                continue
            bi, bk = xyxy[i], xyxy[k]
            iw = max(0.0, min(bi[2], bk[2]) - max(bi[0], bk[0]))
            ih = max(0.0, min(bi[3], bk[3]) - max(bi[1], bk[1]))
            inter = iw * ih
            a_i = (bi[2] - bi[0]) * (bi[3] - bi[1])
            a_k = (bk[2] - bk[0]) * (bk[3] - bk[1])
            if inter / (a_i + a_k - inter) > iou_thres and best[k] <= best[i]:
                sup.add(k)
    keep = keep[:50]

    assert count == len(keep)
    np.testing.assert_allclose(dets[:count, :4], xyxy[keep], atol=1e-3)
    np.testing.assert_allclose(dets[:count, 4], best[keep], atol=1e-5)
    np.testing.assert_array_equal(dets[:count, 5].astype(int), j[keep])


def test_suppress_kernel_equals_xla():
    """The Pallas suppression kernel (interpret mode) is exact-equal to
    the vmapped XLA fixpoint, including long suppression chains and
    all-invalid rows."""
    import functools
    import jax
    from fastdet.kernels.nms_kernel import suppress_ranked_batch
    from fastdet.ops.nms import suppress_ranked

    rng = np.random.RandomState(11)
    b, k = 4, 128
    # overlapping chains: many boxes sharing centers → deep dependency
    cxy = rng.rand(b, k, 2).astype(np.float32) * 60      # crowded field
    wh = rng.rand(b, k, 2).astype(np.float32) * 40 + 10
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1)
    score = np.sort(rng.rand(b, k).astype(np.float32))[:, ::-1].copy()
    cls = rng.randint(0, 3, (b, k))
    valid = rng.rand(b, k) > 0.2
    valid[-1, :] = False                                  # empty image
    score = np.where(valid, score, -1.0).astype(np.float32)

    args = (jnp.asarray(boxes), jnp.asarray(score), jnp.asarray(cls),
            jnp.asarray(valid))
    fn = functools.partial(suppress_ranked, iou_thres=0.4, max_det=50)
    ref_det, ref_n = jax.vmap(fn)(*args)
    got_det, got_n = suppress_ranked_batch(*args, iou_thres=0.4,
                                           max_det=50, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref_n), np.asarray(got_n))
    np.testing.assert_array_equal(np.asarray(ref_det), np.asarray(got_det))


@pytest.mark.parametrize("k", [1300, 2048])
def test_suppress_kernel_tiled_equals_xla(k):
    """The blocked (tiled) suppression kernel — eval-grade windows,
    k > 1024 — is exact-equal to the vmapped XLA fixpoint, including
    cross-block suppression chains and non-tile-multiple k (padding)."""
    import functools
    import jax
    from fastdet.kernels.nms_kernel import suppress_ranked_batch
    from fastdet.ops.nms import suppress_ranked

    rng = np.random.RandomState(5)
    b = 2
    # crowded field → suppression chains that cross the 1024 boundary
    cxy = rng.rand(b, k, 2).astype(np.float32) * 120
    wh = rng.rand(b, k, 2).astype(np.float32) * 50 + 10
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1)
    score = np.sort(rng.rand(b, k).astype(np.float32))[:, ::-1].copy()
    cls = rng.randint(0, 3, (b, k))
    valid = rng.rand(b, k) > 0.1
    score = np.where(valid, score, -1.0).astype(np.float32)

    args = (jnp.asarray(boxes), jnp.asarray(score), jnp.asarray(cls),
            jnp.asarray(valid))
    fn = functools.partial(suppress_ranked, iou_thres=0.4, max_det=300)
    ref_det, ref_n = jax.vmap(fn)(*args)
    got_det, got_n = suppress_ranked_batch(*args, iou_thres=0.4,
                                           max_det=300, interpret=True)
    assert int(np.asarray(ref_n).min()) > 0
    np.testing.assert_array_equal(np.asarray(ref_n), np.asarray(got_n))
    np.testing.assert_array_equal(np.asarray(ref_det), np.asarray(got_det))


def test_suppress_kernel_honors_valid_nonpositive_score():
    """valid_k is authoritative: a candidate with valid_k=True but
    score ≤ 0 must still be eligible (the kernel encodes validity as an
    explicit ±1 operand, not score>0 — ADVICE r2)."""
    import functools
    import jax
    from fastdet.kernels.nms_kernel import suppress_ranked_batch
    from fastdet.ops.nms import suppress_ranked

    boxes = np.asarray([[[0, 0, 10, 10], [100, 100, 110, 110],
                         [1, 1, 11, 11], [200, 200, 210, 210]]], np.float32)
    score = np.asarray([[0.9, 0.0, -0.1, -0.5]], np.float32)  # descending
    cls = np.zeros((1, 4), np.int64)
    valid = np.asarray([[True, True, True, False]])

    args = (jnp.asarray(boxes), jnp.asarray(score), jnp.asarray(cls),
            jnp.asarray(valid))
    fn = functools.partial(suppress_ranked, iou_thres=0.4, max_det=10)
    ref_det, ref_n = jax.vmap(fn)(*args)
    got_det, got_n = suppress_ranked_batch(*args, iou_thres=0.4,
                                           max_det=10, interpret=True)
    # the zero- and negative-score valid candidates are kept/suppressed
    # exactly like the XLA path (box 1 kept, box 2 suppressed by box 0)
    assert int(ref_n[0]) == 2
    np.testing.assert_array_equal(np.asarray(ref_n), np.asarray(got_n))
    np.testing.assert_array_equal(np.asarray(ref_det), np.asarray(got_det))


def test_topk_first_equals_dense():
    """The production top-k-first postprocess (score factorization +
    payload sort + post-selection decode) is BITWISE equal to the dense
    decode-then-NMS composition for every serving/eval config."""
    from fastdet.ops.postprocess import postprocess, postprocess_dense
    rng = np.random.RandomState(3)
    b = 4
    outs = []
    for (h, w) in ((22, 22), (11, 11)):
        outs.append(jnp.asarray(rng.randn(b, h, w, 12).astype(np.float32)))
        outs.append(jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32) - 2))
        outs.append(jnp.asarray(rng.randn(b, h, w, 80).astype(np.float32) * 3))
    anchors = jnp.asarray(np.array(
        [12.64, 19.39, 37.88, 51.48, 55.71, 138.31,
         126.91, 78.23, 131.57, 214.55, 279.92, 258.87],
        np.float32).reshape(2, 3, 2))
    for conf, mnms in ((0.3, 256), (0.01, 2048), (0.01, 1024)):
        d1, c1 = postprocess_dense(outs, anchors, (352, 352),
                                   conf_thres=conf, iou_thres=0.4,
                                   max_nms=mnms)
        d2, c2 = postprocess(outs, anchors, (352, 352), conf_thres=conf,
                             iou_thres=0.4, max_nms=mnms)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
        assert int(np.asarray(c1).sum()) > 0


def test_topk_first_uniform_logits_ties():
    """Tie handling: constant logits make every candidate score equal;
    the payload sort must tie-break like top_k (original index order) so
    the fast path still matches the dense path exactly."""
    from fastdet.ops.postprocess import postprocess, postprocess_dense
    b = 2
    outs = []
    for (h, w) in ((22, 22), (11, 11)):
        outs.append(jnp.zeros((b, h, w, 12), jnp.float32))
        outs.append(jnp.ones((b, h, w, 3), jnp.float32))
        outs.append(jnp.zeros((b, h, w, 80), jnp.float32))
    anchors = jnp.asarray(np.array(
        [12.64, 19.39, 37.88, 51.48, 55.71, 138.31,
         126.91, 78.23, 131.57, 214.55, 279.92, 258.87],
        np.float32).reshape(2, 3, 2))
    d1, c1 = postprocess_dense(outs, anchors, (352, 352), conf_thres=0.005,
                               iou_thres=0.4, max_nms=2048)
    d2, c2 = postprocess(outs, anchors, (352, 352), conf_thres=0.005,
                         iou_thres=0.4, max_nms=2048)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_nms_empty():
    """No box above threshold → zero detections, zero-filled output."""
    boxes = jnp.ones((1, 10, 4)) * 50
    obj = jnp.zeros((1, 10))
    cls = jnp.ones((1, 10, 3)) / 3
    dets, count = batched_nms(boxes, obj, cls, conf_thres=0.3,
                              iou_thres=0.4, max_det=8, max_nms=16)
    assert int(count[0]) == 0
    assert float(jnp.abs(dets).sum()) == 0.0


@requires_reference
def test_golden_image_bf16_serving(ref_variables, coco_cfg, golden_batch):
    """The bf16 serving configuration (bench.py's) finds the same objects
    with scores within bf16 tolerance of the fp32 path."""
    import jax.numpy as jnp
    model32 = Detector(classes=80, anchor_num=3)
    model16 = Detector(classes=80, anchor_num=3, dtype=jnp.bfloat16)
    d32 = build_detect_fn(model32, coco_cfg, conf_thres=0.3, iou_thres=0.4)
    d16 = build_detect_fn(model16, coco_cfg, conf_thres=0.3, iou_thres=0.4,
                          max_nms=256)
    dets32, n32 = d32(ref_variables, jnp.asarray(golden_batch))
    dets16, n16 = d16(ref_variables, jnp.asarray(golden_batch))
    n32, n16 = int(n32[0]), int(n16[0])
    assert n16 == n32
    a, b = np.asarray(dets32[0][:n32]), np.asarray(dets16[0][:n16])
    np.testing.assert_array_equal(a[:, 5], b[:, 5])        # same classes
    np.testing.assert_allclose(a[:, :4], b[:, :4], atol=4.0)  # boxes ±4px
    np.testing.assert_allclose(a[:, 4], b[:, 4], atol=0.05)   # scores


@requires_reference
def test_detect_at_640(ref_variables):
    """The stack is fully convolutional: the 640x640 streaming config
    (BASELINE.json stretch goal) runs through the same fused path with
    strides derived from shapes."""
    from fastdet.config import Config
    cfg640 = Config.from_dict({
        "classes": 80, "width": 640, "height": 640, "anchor_num": 3,
        "anchors": [12.64, 19.39, 37.88, 51.48, 55.71, 138.31,
                    126.91, 78.23, 131.57, 214.55, 279.92, 258.87]})
    model = Detector(classes=80, anchor_num=3)
    ori = cv2.imread(GOLDEN_IMG)
    img = cv2.resize(ori, (640, 640), interpolation=cv2.INTER_LINEAR)
    detect = build_detect_fn(model, cfg640, conf_thres=0.3, iou_thres=0.4)
    dets, counts = detect(ref_variables, jnp.asarray(img[None]))
    n = int(counts[0])
    assert n >= 1
    d = np.asarray(dets[0][:n])
    assert (d[:, :4] >= -50).all() and (d[:, :4] <= 700).all()
    assert 0.0 in d[:, 5]  # finds the person at this scale too


def test_fused_rank_decode_nms_equals_staged():
    """The fully fused serving kernel (2-operand sort + in-VMEM one-hot
    gather + in-kernel decode + greedy NMS, fastdet/kernels/pp_fused.py)
    is BITWISE equal to the staged path (6-operand sort + XLA decode +
    NMS kernel) and to the dense oracle — interpret mode on CPU.

    nms_kernel=True forces the fused branch off-TPU (k=256, 128-aligned
    serving window); nms_kernel=False is the staged XLA fixpoint."""
    from fastdet.ops.postprocess import postprocess, postprocess_dense
    rng = np.random.RandomState(11)
    anchors = jnp.asarray(np.array(
        [12.64, 19.39, 37.88, 51.48, 55.71, 138.31,
         126.91, 78.23, 131.57, 214.55, 279.92, 258.87],
        np.float32).reshape(2, 3, 2))

    def mk(b, obj_shift):
        outs = []
        for (h, w) in ((22, 22), (11, 11)):
            outs.append(jnp.asarray(
                rng.randn(b, h, w, 12).astype(np.float32) * 2))
            outs.append(jnp.asarray(
                rng.randn(b, h, w, 3).astype(np.float32) + obj_shift))
            outs.append(jnp.asarray(
                rng.randn(b, h, w, 80).astype(np.float32) * 3))
        return outs

    # dense valid set (most candidates pass conf) and sparse (<k pass)
    for b, obj_shift, conf in ((4, 2.0, 0.005), (2, -2.0, 0.3), (1, 0.0, 0.1)):
        outs = mk(b, obj_shift)
        d_ref, c_ref = postprocess(outs, anchors, (352, 352),
                                   conf_thres=conf, iou_thres=0.4,
                                   max_nms=256, nms_kernel=False)
        d_fus, c_fus = postprocess(outs, anchors, (352, 352),
                                   conf_thres=conf, iou_thres=0.4,
                                   max_nms=256, nms_kernel=True)
        d_dense, c_dense = postprocess_dense(outs, anchors, (352, 352),
                                             conf_thres=conf, iou_thres=0.4,
                                             max_nms=256)
        np.testing.assert_array_equal(np.asarray(c_ref), np.asarray(c_fus))
        np.testing.assert_array_equal(np.asarray(d_ref), np.asarray(d_fus))
        np.testing.assert_array_equal(np.asarray(c_dense), np.asarray(c_fus))
        np.testing.assert_array_equal(np.asarray(d_dense), np.asarray(d_fus))


def test_fused_rank_decode_nms_ties():
    """Constant logits (all scores equal): the 2-operand sort must
    tie-break by original index exactly like the 6-operand form."""
    from fastdet.ops.postprocess import postprocess
    anchors = jnp.asarray(np.array(
        [12.64, 19.39, 37.88, 51.48, 55.71, 138.31,
         126.91, 78.23, 131.57, 214.55, 279.92, 258.87],
        np.float32).reshape(2, 3, 2))
    outs = []
    for (h, w) in ((22, 22), (11, 11)):
        outs.append(jnp.zeros((2, h, w, 12), jnp.float32))
        outs.append(jnp.ones((2, h, w, 3), jnp.float32))
        outs.append(jnp.zeros((2, h, w, 80), jnp.float32))
    d1, c1 = postprocess(outs, anchors, (352, 352), conf_thres=0.005,
                         iou_thres=0.4, max_nms=256, nms_kernel=False)
    d2, c2 = postprocess(outs, anchors, (352, 352), conf_thres=0.005,
                         iou_thres=0.4, max_nms=256, nms_kernel=True)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
