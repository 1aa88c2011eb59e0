#!/usr/bin/env python
"""Generate the anchor-free golden-detections artifact
(tests/data/anchorfree_golden.json, VERDICT r3 #7).

The pin fixes checkpoint + image → boxes, exactly like the yolo
family's golden-image pin (tests/test_postprocess.py): weights are the
committed `weights/anchorfree-synth.npz` — the anchor-free model
TRAINED on the synthetic rectangle task by
`tools/convergence_check.py --model anchorfree --save ...` (mAP@0.5
≈0.8, PARITY.md) — and the image is a deterministic sample of that
task (`make_sample`, fixed seed).  A trained net produces confident,
well-separated detections, so the pin is stable across environments;
earlier attempts to pin a random-init net failed twice (near-uniform
scores tie-break on ~1e-6 jitter; amplifying the head weights spreads
scores but saturates boxes into NMS-cascade flips).

The committed JSON is what
tests/test_anchorfree.py::test_af_golden_detections re-derives and
compares against (score-hysteresis matching), so any numeric drift in
the anchor-free forward, decode, or NMS fails the suite.

Run from the repo root (CPU):  python tools/make_af_golden.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

import jax
import jax.numpy as jnp

from tools.convergence_check import make_sample
from fastdet.io.torch_convert import load_npz_variables
from fastdet.models.anchorfree import (AnchorFreeDetector,
                                       build_anchorfree_detect_fn)

SIZE = 128
IMG_SEED = 1234
CONF, IOU, MAX_NMS = 0.3, 0.45, 256


def golden_image():
    """Deterministic synthetic-task sample (3 colored rectangles)."""
    img, labels = make_sample(np.random.RandomState(IMG_SEED), SIZE)
    return img, labels


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model = AnchorFreeDetector(classes=3)
    variables = jax.tree.map(jnp.asarray, load_npz_variables(
        os.path.join(repo, "weights", "anchorfree-synth.npz")))
    img, labels = golden_image()

    detect = build_anchorfree_detect_fn(model, (SIZE, SIZE),
                                        conf_thres=CONF, iou_thres=IOU,
                                        max_nms=MAX_NMS)
    dets, counts = detect(variables, jnp.asarray(img[None]))
    n = int(counts[0])
    rows = np.asarray(dets[0, :n], np.float64)
    out = {
        "weights": "weights/anchorfree-synth.npz",
        "img_seed": IMG_SEED, "size": SIZE,
        "conf_thres": CONF, "iou_thres": IOU, "max_nms": MAX_NMS,
        "labels": [[round(float(v), 5) for v in r] for r in labels],
        "count": n,
        "detections": [[round(float(v), 5) for v in r] for r in rows],
    }
    path = os.path.join(repo, "tests", "data", "anchorfree_golden.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: {n} detections "
          f"(scores {sorted(round(r[4], 3) for r in rows)})")


if __name__ == "__main__":
    main()
