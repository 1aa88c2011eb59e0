#!/usr/bin/env python
"""Single-image detection CLI (argparse parity with the reference test.py).

Usage:
  python cli/test.py --data data/coco.data --weights weights/coco.npz \
                     --img img/000139.jpg

Unlike the reference (forward, then a python decode loop, then
torchvision NMS — test.py:41-49), the whole image→boxes path is one
jitted XLA program.  Boxes are rescaled to the original image size with
the same non-aspect-preserving (h/H, w/W) factors (test.py:57-68).
"""

import argparse
import os
import time

import _bootstrap  # noqa: F401
import cv2
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=str, default="",
                        help="Specify training profile *.data")
    parser.add_argument("--weights", type=str, default="",
                        help="The path of the model weights (.npz/.pth/dir)")
    parser.add_argument("--img", type=str, default="",
                        help="The path of test image")
    parser.add_argument("--output", type=str, default="test_result.png")
    parser.add_argument("--model", type=str, default="yolo-fastestv2",
                        help="model family: yolo-fastestv2 | anchorfree")
    parser.add_argument("--conf", type=float, default=0.3)
    parser.add_argument("--nms", type=float, default=0.4)
    parser.add_argument("--fused", action="store_true",
                        help="run the Pallas fused serving path "
                             "(FusedPipeline; s2d input layout)")
    parser.add_argument("--int8", type=str, default="",
                        help="run int8 PTQ inference from a cli/quantize.py "
                             "artifact (.npz) instead of f32 weights")
    opt = parser.parse_args()

    from fastdet.config import Config, load_names
    cfg = Config.from_file(opt.data)
    assert opt.int8 or os.path.exists(opt.weights), "invalid weights path"
    assert os.path.exists(opt.img), "invalid test image path"

    import jax
    import jax.numpy as jnp
    # match the reference chain's f32 accuracy (TPU f32 convs otherwise
    # run as bf16 passes — see cli/evaluation.py)
    jax.config.update("jax_default_matmul_precision", "highest")
    from fastdet.io import load_variables
    from fastdet.models.registry import get_family
    family = get_family(opt.model, cfg)
    if not opt.int8:
        variables = jax.tree.map(jnp.asarray, load_variables(opt.weights))

    ori_img = cv2.imread(opt.img)
    res_img = cv2.resize(ori_img, (cfg.width, cfg.height),
                         interpolation=cv2.INTER_LINEAR)

    if opt.int8:
        from fastdet.ops.postprocess import postprocess
        from fastdet.quant import forward_from, load_quantized
        from fastdet.quant.ptq import infer_family
        qw, scales = load_quantized(opt.int8)
        fwd = forward_from(qw, scales)
        qw = jax.tree.map(jnp.asarray, qw)
        anchors = jnp.asarray(
            np.asarray(cfg.anchors, np.float32).reshape(-1, 3, 2))

        # anchors AND the quantized weights as runtime args, never baked
        # jit constants (compile blowup on the axon backend — see
        # .claude/skills/verify and fastdet/quant/ptq.py::forward_from)
        if infer_family(qw) == "anchorfree":
            from fastdet.models.anchorfree import decode_anchorfree
            from fastdet.ops.nms import batched_nms

            @jax.jit
            def detect_q(im, anc, weights):
                obj, cls, reg = fwd(im, weights)
                boxes, obj_p, cls_p = decode_anchorfree(
                    obj, cls, reg, (cfg.height, cfg.width))
                return batched_nms(boxes, obj_p, cls_p,
                                   conf_thres=opt.conf,
                                   iou_thres=opt.nms)
        else:
            @jax.jit
            def detect_q(im, anc, weights):
                return postprocess(fwd(im, weights), anc,
                                   (cfg.height, cfg.width),
                                   conf_thres=opt.conf, iou_thres=opt.nms)

        batch = jnp.asarray(res_img[None])
        jax.block_until_ready(detect_q(batch, anchors, qw))    # compile
        start = time.perf_counter()
        dets, counts = jax.block_until_ready(detect_q(batch, anchors, qw))
        end = time.perf_counter()
    elif opt.fused:
        from fastdet.serve import FusedPipeline
        pipe = FusedPipeline(variables, cfg, conf_thres=opt.conf,
                             iou_thres=opt.nms, dtype=jnp.float32,
                             interpret=jax.default_backend() != "tpu",
                             family=opt.model)
        pipe(res_img[None])                       # compile
        start = time.perf_counter()
        rows = pipe(res_img[None])[0]
        end = time.perf_counter()
        dets = jnp.asarray(rows)[None]
        counts = np.asarray([len(rows)])
    else:
        detect = family.build_detect_fn(conf_thres=opt.conf,
                                        iou_thres=opt.nms)
        batch = jnp.asarray(res_img[None])
        # compile, then time the fused inference
        jax.block_until_ready(detect(variables, batch))
        start = time.perf_counter()
        dets, counts = jax.block_until_ready(detect(variables, batch))
        end = time.perf_counter()
    print("forward time:%fms" % ((end - start) * 1000.0))

    from fastdet.config import resolve_path
    names_path = resolve_path(cfg.names, opt.data)
    names = load_names(names_path) if names_path and os.path.exists(names_path) \
        else [str(i) for i in range(cfg.classes)]

    h, w, _ = ori_img.shape
    scale_h, scale_w = h / cfg.height, w / cfg.width

    dets = np.asarray(dets[0][:int(counts[0])])
    for box in dets.tolist():
        obj_score = box[4]
        category = names[int(box[5])]
        x1, y1 = int(box[0] * scale_w), int(box[1] * scale_h)
        x2, y2 = int(box[2] * scale_w), int(box[3] * scale_h)
        cv2.rectangle(ori_img, (x1, y1), (x2, y2), (255, 255, 0), 2)
        cv2.putText(ori_img, "%.2f" % obj_score, (x1, y1 - 5), 0, 0.7,
                    (0, 255, 0), 2)
        cv2.putText(ori_img, category, (x1, y1 - 25), 0, 0.7,
                    (0, 255, 0), 2)
        print(f"{category} {obj_score:.3f} [{x1},{y1},{x2},{y2}]")

    cv2.imwrite(opt.output, ori_img)
    print(f"saved {opt.output} ({len(dets)} detections)")


if __name__ == "__main__":
    main()
