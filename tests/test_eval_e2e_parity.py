"""End-to-end evaluation parity: our evaluate() vs the reference
evaluation() on the same images + labels with the same trained weights.

COCO val2017 isn't available in this environment, so the parity gate is
run on a small image set built from the reference's own sample images
(real photos → real detections) with synthetic-but-plausible labels.
Both eval chains see identical inputs; (P, R, mAP, F1) must match.
"""

import os

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from fastdet.eval.runner import evaluate
from fastdet.models import Detector
from fastdet.ops.postprocess import build_detect_fn
from tests.conftest import REFERENCE, requires_reference

IMG_DIR = os.path.join(REFERENCE, "img")


@pytest.fixture(scope="module")
def eval_set(coco_cfg):
    """(images u8 (N,352,352,3), per-image labels [cls,cx,cy,w,h])."""
    paths = sorted(
        os.path.join(IMG_DIR, f) for f in os.listdir(IMG_DIR)
        if f.endswith(".jpg"))
    assert len(paths) >= 3
    imgs = np.stack([
        cv2.resize(cv2.imread(p), (coco_cfg.width, coco_cfg.height),
                   interpolation=cv2.INTER_LINEAR) for p in paths])
    rng = np.random.RandomState(0)
    labels = []
    for _ in paths:
        n = rng.randint(2, 6)
        cls = rng.randint(0, 10, n)
        cxy = rng.uniform(0.2, 0.8, (n, 2))
        wh = rng.uniform(0.1, 0.5, (n, 2))
        labels.append(np.concatenate([cls[:, None], cxy, wh], 1)
                      .astype(np.float32))
    return imgs, labels


def _ref_evaluation(torch_ref, torch_model, coco_cfg, imgs, labels,
                    conf_thres):
    """Run the reference evaluation() with a fake dataloader."""
    torch = torch_ref.torch
    batches = []
    for i in range(0, len(imgs), 2):
        chunk = imgs[i:i + 2]
        t_imgs = torch.from_numpy(chunk.transpose(0, 3, 1, 2).copy())
        rows = []
        for j, lab in enumerate(labels[i:i + 2]):
            rows.append(np.concatenate(
                [np.full((len(lab), 1), j, np.float32), lab], 1))
        t_tgt = torch.from_numpy(np.concatenate(rows, 0))
        batches.append((t_imgs, t_tgt))
    res = torch_ref.utils.evaluation(batches, coco_cfg.to_dict(),
                                     torch_model, "cpu",
                                     conf_thres=conf_thres, nms_thresh=0.4)
    return tuple(float(x) for x in res)


def _our_evaluation(ref_variables, coco_cfg, imgs, labels, conf_thres):
    model = Detector(classes=80, anchor_num=3)
    detect = build_detect_fn(model, coco_cfg, conf_thres=conf_thres,
                             iou_thres=0.4, max_nms=2048)

    def batches():
        for i in range(0, len(imgs), 2):
            chunk = imgs[i:i + 2]
            labs = labels[i:i + 2]
            m = max(len(l) for l in labs)
            lab_arr = np.zeros((len(chunk), m, 5), np.float32)
            mask = np.zeros((len(chunk), m), bool)
            for j, l in enumerate(labs):
                lab_arr[j, :len(l)] = l
                mask[j, :len(l)] = True
            yield jnp.asarray(chunk), lab_arr, mask

    return evaluate(detect, ref_variables, batches(),
                    (coco_cfg.height, coco_cfg.width), iou_thres=0.5)


@requires_reference
@pytest.mark.parametrize("conf_thres", [0.3, 0.01])
def test_evaluation_parity(torch_ref, torch_model, ref_variables, coco_cfg,
                           eval_set, conf_thres):
    imgs, labels = eval_set
    ref = _ref_evaluation(torch_ref, torch_model, coco_cfg, imgs, labels,
                          conf_thres)
    ours = _our_evaluation(ref_variables, coco_cfg, imgs, labels,
                           conf_thres)
    assert ours is not None
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)
