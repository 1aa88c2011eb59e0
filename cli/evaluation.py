#!/usr/bin/env python
"""Dataset evaluation CLI (argparse parity with the reference
evaluation.py): runs the val set twice — mAP at conf 0.01 and P/R/F1 at
conf 0.3 — and prints the same summary line."""

import argparse
import os

import _bootstrap  # noqa: F401


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=str, default="",
                        help="Specify training profile *.data")
    parser.add_argument("--weights", type=str, default="",
                        help="The path of the model weights")
    parser.add_argument("--model", type=str, default="yolo-fastestv2",
                        help="model family: yolo-fastestv2 | anchorfree")
    parser.add_argument("--batch", type=int, default=0,
                        help="override eval batch size")
    opt = parser.parse_args()

    from fastdet.config import Config
    cfg = Config.from_file(opt.data)
    assert os.path.exists(opt.weights), "invalid weights path"

    print("eval config:")
    print("model_name:%s" % cfg.model_name)
    print("width:%d height:%d" % (cfg.width, cfg.height))
    print("val:%s" % cfg.val)
    print("model_path:%s" % opt.weights)

    import jax
    import jax.numpy as jnp
    from fastdet.data import DarknetDataset, DataLoader
    from fastdet.eval.runner import evaluate
    from fastdet.io import load_variables
    from fastdet.models.registry import get_family
    family = get_family(opt.model, cfg)
    variables = jax.tree.map(jnp.asarray, load_variables(opt.weights))

    batch_size = opt.batch or int(cfg.batch_size / (cfg.subdivisions or 1))
    val_ds = DarknetDataset(cfg.val, cfg.width, cfg.height, augment=None)
    # multi-host: each process evaluates its own shard, stats are
    # all-gathered so every host prints identical global metrics
    shard = ((jax.process_index(), jax.process_count())
             if jax.process_count() > 1 else None)
    dist = shard is not None

    def batches():
        loader = DataLoader(val_ds, batch_size, shuffle=False,
                            drop_last=False, shard=shard)
        for images, labels, mask in loader:
            yield jnp.asarray(images), labels, mask

    print("computer mAP...")
    # mAP at conf 0.01 keeps nearly every candidate: use a full-coverage
    # NMS window (reference caps at 30k, far above the 1815 cells)
    detect_map = family.build_detect_fn(conf_thres=0.01, iou_thres=0.4,
                                        max_nms=2048)
    res_map = evaluate(detect_map, variables, batches(),
                       (cfg.height, cfg.width), progress=True,
                       distributed=dist)
    print("computer PR...")
    detect_pr = family.build_detect_fn(conf_thres=0.3, iou_thres=0.4)
    res_pr = evaluate(detect_pr, variables, batches(),
                      (cfg.height, cfg.width), progress=True,
                      distributed=dist)
    ap = res_map[2] if res_map else 0.0
    precision, recall, f1 = (res_pr[0], res_pr[1], res_pr[3]) if res_pr \
        else (0.0, 0.0, 0.0)
    print("Precision:%f Recall:%f AP:%f F1:%f" % (precision, recall, ap, f1))


if __name__ == "__main__":
    main()
