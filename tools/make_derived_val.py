#!/usr/bin/env python
"""Generate the DETERMINISTIC derived validation set (COCO-runbook dry-run).

COCO val2017 is not available in this environment, so evaluation-parity
gates run on a few hundred images derived reproducibly from the
reference's own sample photos (/root/reference/img/*.jpg): scale crops ×
anchor positions × horizontal flip × contrast — real image statistics
without the dataset.  Labels are synthetic-but-plausible, keyed by a
fixed RNG seed; both eval chains (the reference's evaluation.py and
cli/evaluation.py) read the SAME files from disk, so any metric
difference is a difference in the chains, not the data.

Writes into --out:
  images/dv_NNNN.png + dv_NNNN.txt   Darknet-layout samples (PNG:
                                     lossless, so bytes are reproducible)
  val.txt                            absolute image-path list
  derived.data                       ready-to-use eval config (COCO
                                     classes/anchors, val→this list)
  MANIFEST.json                      count + per-file md5 for auditing

Dry-run of the runbook (docs/COCO_RUNBOOK.md):
  python tools/make_derived_val.py --out /tmp/derived
  python cli/evaluation.py --data /tmp/derived/derived.data \
      --weights weights/coco2017-ref.npz
and the same derived.data drives the reference evaluation.py for the
side-by-side comparison (tests/test_cli_ref_parity.py automates it).
"""

import argparse
import hashlib
import json
import os
import sys

import cv2
import numpy as np

REFERENCE = os.environ.get("FASTDET_REFERENCE", "/root/reference")


def derived_images(img_dir, width=352, height=352, count=500):
    """Deterministic derived image stream (same recipe as
    tests/test_eval_e2e_parity.py::_derived_image_set).

    The stream is PREFIX-STABLE: pass 1 (scales .9/.7/.55, 300 images
    from the 5 reference photos) is byte-identical to the original
    300-image recipe, so goldens pinned from its prefixes
    (tests/data/derived_val_100.json = the first 100) never move; pass
    2 appends new scale crops (.45/.8) for the widened 500-image set
    (VERDICT r4 #6)."""
    paths = sorted(os.path.join(img_dir, f) for f in os.listdir(img_dir)
                   if f.endswith(".jpg"))
    out = []
    for scales in ((0.9, 0.7, 0.55), (0.45, 0.8)):
        for p in paths:
            src = cv2.imread(p)
            sh, sw = src.shape[:2]
            for scale in scales:
                ch, cw = int(sh * scale), int(sw * scale)
                for ay, ax in ((0, 0), (0, 1), (1, 0), (1, 1), (0.5, 0.5)):
                    y0, x0 = int((sh - ch) * ay), int((sw - cw) * ax)
                    crop = src[y0:y0 + ch, x0:x0 + cw]
                    base = cv2.resize(crop, (width, height),
                                      interpolation=cv2.INTER_LINEAR)
                    for flip in (False, True):
                        img = base[:, ::-1] if flip else base
                        for alpha in (1.0, 0.75):
                            v = img if alpha == 1.0 else cv2.convertScaleAbs(
                                img, alpha=alpha, beta=12)
                            out.append(np.ascontiguousarray(v))
                            if len(out) >= count:
                                return out
    return out


def derived_labels(n, classes=80, seed=7):
    """Per-image [cls cx cy w h] rows (normalized), fixed-seed."""
    rng = np.random.RandomState(seed)
    labels = []
    for _ in range(n):
        k = rng.randint(1, 7)
        cls = rng.randint(0, classes, k)
        cxy = rng.uniform(0.15, 0.85, (k, 2))
        wh = rng.uniform(0.08, 0.5, (k, 2))
        labels.append(np.concatenate([cls[:, None], cxy, wh], 1)
                      .astype(np.float32))
    return labels


DATA_TEMPLATE = """[name]
model_name=derived-val

[train-configure]
epochs=1
steps=100,200
batch_size={batch}
subdivisions=1
learning_rate=0.001

[model-configure]
pre_weights=None
classes={classes}
width={width}
height={height}
anchor_num=3
anchors={anchors}

[data-configure]
train={val_txt}
val={val_txt}
names={names}
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--count", type=int, default=500)
    ap.add_argument("--width", type=int, default=352)
    ap.add_argument("--height", type=int, default=352)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--img_dir", default=os.path.join(REFERENCE, "img"))
    args = ap.parse_args()

    img_out = os.path.join(args.out, "images")
    os.makedirs(img_out, exist_ok=True)
    imgs = derived_images(args.img_dir, args.width, args.height, args.count)
    labels = derived_labels(len(imgs))

    manifest = {"count": len(imgs), "files": {}}
    paths = []
    for i, (img, lab) in enumerate(zip(imgs, labels)):
        # NOTE: exactly one dot in the filename — both datasets derive
        # the label path by first-dot substitution (reference
        # utils/datasets.py:102)
        p = os.path.join(img_out, "dv_%04d.png" % i)
        ok = cv2.imwrite(p, img)
        assert ok, p
        rows = "".join("%d %.6f %.6f %.6f %.6f\n"
                       % (int(r[0]), r[1], r[2], r[3], r[4]) for r in lab)
        with open(os.path.join(img_out, "dv_%04d.txt" % i), "w") as f:
            f.write(rows)
        paths.append(p)
        manifest["files"][os.path.basename(p)] = {
            "img_md5": hashlib.md5(open(p, "rb").read()).hexdigest(),
            "label_md5": hashlib.md5(rows.encode()).hexdigest(),
        }

    val_txt = os.path.join(args.out, "val.txt")
    with open(val_txt, "w") as f:
        f.write("\n".join(paths) + "\n")

    # anchors/classes/names come from the reference COCO config
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from fastdet.config import Config
    coco = Config.from_file(os.path.join(REFERENCE, "data", "coco.data"))
    with open(os.path.join(args.out, "derived.data"), "w") as f:
        f.write(DATA_TEMPLATE.format(
            batch=args.batch, classes=coco.classes, width=args.width,
            height=args.height,
            anchors=",".join("%g" % a for a in coco.anchors),
            val_txt=val_txt,
            names=os.path.join(REFERENCE, "data", "coco.names")))
    with open(os.path.join(args.out, "MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print(f"wrote {len(imgs)} derived images + labels to {args.out}")


if __name__ == "__main__":
    main()
