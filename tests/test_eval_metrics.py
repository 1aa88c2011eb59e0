"""Eval metric parity vs the reference implementations (oracle-run)."""

import numpy as np
import pytest

from fastdet.eval.metrics import ap_per_class, average_precision, \
    batch_statistics
from tests.conftest import requires_reference


def _rand_eval_case(rng, n_img=4, nc=6):
    """Random detections (score-sorted) + targets per image."""
    dets, tboxes, tlabels = [], [], []
    for _ in range(n_img):
        n = rng.randint(0, 12)
        xy = rng.uniform(0, 300, (n, 2))
        wh = rng.uniform(5, 80, (n, 2))
        conf = np.sort(rng.uniform(0.05, 1.0, n))[::-1]
        cls = rng.randint(0, nc, n).astype(np.float64)
        dets.append(np.concatenate(
            [xy, xy + wh, conf[:, None], cls[:, None]], 1))
        m = rng.randint(0, 8)
        txy = rng.uniform(0, 300, (m, 2))
        twh = rng.uniform(5, 80, (m, 2))
        tboxes.append(np.concatenate([txy, txy + twh], 1))
        tlabels.append(rng.randint(0, nc, m).astype(np.float64))
    return dets, tboxes, tlabels


@requires_reference
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_batch_statistics_parity(torch_ref, seed):
    torch = torch_ref.torch
    rng = np.random.RandomState(seed)
    dets, tboxes, tlabels = _rand_eval_case(rng)

    ours = batch_statistics(dets, tboxes, tlabels, iou_threshold=0.5)

    # reference form: outputs list of (n,6) tensors; targets (N,6) rows
    # [img_idx, cls, x1, y1, x2, y2]
    outputs = [torch.from_numpy(d) if len(d) else None for d in dets]
    rows = []
    for i, (tb, tl) in enumerate(zip(tboxes, tlabels)):
        for b, l in zip(tb, tl):
            rows.append([i, l, b[0], b[1], b[2], b[3]])
    targets = torch.from_numpy(np.asarray(rows, np.float64).reshape(-1, 6))
    ref = torch_ref.utils.get_batch_statistics(outputs, targets, 0.5, "cpu")

    # the reference skips images with no detections (output None); ours
    # emits empty arrays for them — compare the non-empty ones, which is
    # all that survives the downstream concatenation either way
    ours_nonempty = [o for o, d in zip(ours, dets) if len(d)]
    assert len(ref) == len(ours_nonempty)
    for o, (rtp, rconf, rcls) in zip(ours_nonempty, ref):
        np.testing.assert_array_equal(o[0], np.asarray(rtp))
        np.testing.assert_allclose(o[1], np.asarray(rconf))
        np.testing.assert_allclose(o[2], np.asarray(rcls))


@requires_reference
@pytest.mark.parametrize("seed", [0, 1])
def test_ap_per_class_parity(torch_ref, seed):
    rng = np.random.RandomState(seed)
    n = 200
    tp = (rng.rand(n) > 0.6).astype(np.float64)
    conf = rng.rand(n)
    pred_cls = rng.randint(0, 10, n).astype(np.float64)
    target_cls = rng.randint(0, 10, 300).astype(np.float64)

    ours = ap_per_class(tp, conf, pred_cls, target_cls)
    ref = torch_ref.utils.ap_per_class(tp.copy(), conf.copy(),
                                       pred_cls.copy(), target_cls.copy())
    np.testing.assert_allclose(ours, [float(x) for x in ref], rtol=1e-10)


@requires_reference
def test_compute_ap_parity(torch_ref):
    rng = np.random.RandomState(7)
    rec = np.sort(rng.rand(50))
    prec = rng.rand(50)
    ours = average_precision(rec, prec)
    ref = torch_ref.utils.compute_ap(rec.tolist(), prec.tolist())
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_batch_statistics_class_agnostic_quirk():
    """A pred whose class exists in the image can claim a GT of a
    DIFFERENT class (reference behavior, utils.py:216-227)."""
    det = np.array([[10, 10, 50, 50, 0.9, 1.0]])  # class 1
    tb = np.array([[12, 12, 52, 52]])             # GT box (class 0)
    tl = np.array([0.0])
    # class 1 not in labels -> no TP
    (tp, _, _), = batch_statistics([det], [tb], [tl], 0.5)
    assert tp[0] == 0
    # add a class-1 GT elsewhere: now the pred is eligible and claims the
    # overlapping class-0 box
    tb2 = np.array([[12, 12, 52, 52], [200, 200, 240, 240]])
    tl2 = np.array([0.0, 1.0])
    (tp2, _, _), = batch_statistics([det], [tb2], [tl2], 0.5)
    assert tp2[0] == 1
