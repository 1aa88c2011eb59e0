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
    parser.add_argument("--fused", action="store_true",
                        help="evaluate through the Pallas fused inference "
                             "path (s2d input layout; interpret mode when "
                             "not on a TPU backend)")
    parser.add_argument("--int8", type=str, default="",
                        help="evaluate int8 PTQ inference from a "
                             "cli/quantize.py artifact (.npz) instead of "
                             "f32 weights")
    opt = parser.parse_args()

    from fastdet.config import Config
    cfg = Config.from_file(opt.data)
    assert opt.int8 or os.path.exists(opt.weights), "invalid weights path"

    print("eval config:")
    print("model_name:%s" % cfg.model_name)
    print("width:%d height:%d" % (cfg.width, cfg.height))
    print("val:%s" % cfg.val)
    print("model_path:%s" % opt.weights)

    import jax
    from fastdet.parallel.mesh import initialize_distributed
    # multi-host entry: FASTDET_COORDINATOR/_NUM_PROCESSES/_PROCESS_ID
    # env vars start a jax.distributed job (must precede any computation)
    if initialize_distributed():
        print(f"distributed: process {jax.process_index() + 1}"
              f"/{jax.process_count()}")
    import jax.numpy as jnp
    # eval-grade precision: TPU f32 matmuls/convs default to bf16 passes,
    # which perturbs logits by ~0.3 and shifts mAP at conf 0.01; metrics
    # runs pay the ~2× conv cost for true-f32 accumulation instead
    jax.config.update("jax_default_matmul_precision", "highest")
    from fastdet.data import DarknetDataset, DataLoader
    from fastdet.eval.runner import evaluate
    from fastdet.io import load_variables
    from fastdet.models.registry import get_family
    family = get_family(opt.model, cfg)
    variables = (jax.tree.map(jnp.asarray, load_variables(opt.weights))
                 if not opt.int8 else None)

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

    if opt.int8:
        # quantized-accuracy run: the whole val protocol (two passes,
        # same NMS windows and metrics) on the int8 PTQ graph — the role
        # of evaluating the reference's ncnn-int8 deployment artifact.
        # The artifact self-describes its family (op names).
        import numpy as np
        from fastdet.ops.postprocess import postprocess
        from fastdet.quant import forward_from, load_quantized
        from fastdet.quant.ptq import infer_family
        qw, qscales = load_quantized(opt.int8)
        fwd_q = forward_from(qw, qscales)
        qw = jax.tree.map(jnp.asarray, qw)
        anchors = jnp.asarray(np.asarray(cfg.anchors, np.float32).reshape(
            cfg.num_scales, cfg.anchor_num, 2))
        af = infer_family(qw) == "anchorfree"

        def make_detect(conf_thres, iou_thres, max_nms=1024):
            # anchors + quantized weights as runtime args, never baked
            # jit constants (compile blowup on the axon backend — see
            # fastdet/quant/ptq.py::forward_from)
            if af:
                from fastdet.models.anchorfree import decode_anchorfree
                from fastdet.ops.nms import batched_nms

                @jax.jit
                def _d(xs, anchors, weights):
                    obj, cls, reg = fwd_q(xs, weights)
                    boxes, obj_p, cls_p = decode_anchorfree(
                        obj, cls, reg, (cfg.height, cfg.width))
                    return batched_nms(boxes, obj_p, cls_p,
                                       conf_thres=conf_thres,
                                       iou_thres=iou_thres,
                                       max_nms=max_nms)
            else:
                @jax.jit
                def _d(xs, anchors, weights):
                    outs = list(fwd_q(xs, weights))
                    return postprocess(outs, anchors,
                                       (cfg.height, cfg.width),
                                       conf_thres=conf_thres,
                                       iou_thres=iou_thres,
                                       max_nms=max_nms)

            def detect(_variables, images):
                return _d(images, anchors, qw)
            return detect
    elif opt.fused:
        # the production serving path, eval-grade: fp32 fused forward
        # (Pallas span/stem/NMS kernels) + s2d input packing; metrics
        # must match the linen path (pinned by tests/test_cli.py).
        # Both families run it (head= in fused_infer.py).
        import numpy as np
        from fastdet.kernels.fused_infer import (build_fused_forward,
                                                 pack_images_s2d)
        from fastdet.ops.postprocess import postprocess
        interpret = jax.default_backend() != "tpu"
        af = family.name == "anchorfree"
        anchors = jnp.asarray(np.asarray(cfg.anchors, np.float32).reshape(
            cfg.num_scales, cfg.anchor_num, 2))
        fwd, packed = build_fused_forward(
            variables, input_hw=(cfg.height, cfg.width),
            anchor_num=cfg.anchor_num, classes=cfg.classes,
            dtype=jnp.float32, interpret=interpret,
            input_format="s2d_u8",
            head="anchorfree" if af else "yolo")

        def make_detect(conf_thres, iou_thres, max_nms=1024):
            if af:
                from fastdet.models.anchorfree import decode_anchorfree
                from fastdet.ops.nms import batched_nms

                @jax.jit
                def _d(packed, xs, anchors):
                    obj, cls, reg = fwd(xs, packed)
                    boxes, obj_p, cls_p = decode_anchorfree(
                        obj, cls, reg, (cfg.height, cfg.width))
                    return batched_nms(boxes, obj_p, cls_p,
                                       conf_thres=conf_thres,
                                       iou_thres=iou_thres,
                                       max_nms=max_nms)
            else:
                @jax.jit
                def _d(packed, xs, anchors):
                    outs = list(fwd(xs, packed))
                    return postprocess(outs, anchors,
                                       (cfg.height, cfg.width),
                                       conf_thres=conf_thres,
                                       iou_thres=iou_thres,
                                       max_nms=max_nms)

            def detect(_variables, images):
                xs = jnp.asarray(pack_images_s2d(
                    np.asarray(images).astype(np.uint8)))
                return _d(packed, xs, anchors)
            return detect
    else:
        def make_detect(conf_thres, iou_thres, max_nms=1024):
            return family.build_detect_fn(conf_thres=conf_thres,
                                          iou_thres=iou_thres,
                                          max_nms=max_nms)

    print("computer mAP...")
    # mAP at conf 0.01 keeps nearly every candidate: use a full-coverage
    # NMS window (reference caps at 30k, far above the 1815 cells)
    detect_map = make_detect(conf_thres=0.01, iou_thres=0.4,
                             max_nms=2048)
    res_map = evaluate(detect_map, variables, batches(),
                       (cfg.height, cfg.width), progress=True,
                       distributed=dist)
    print("computer PR...")
    detect_pr = make_detect(conf_thres=0.3, iou_thres=0.4)
    res_pr = evaluate(detect_pr, variables, batches(),
                      (cfg.height, cfg.width), progress=True,
                      distributed=dist)
    ap = res_map[2] if res_map else 0.0
    precision, recall, f1 = (res_pr[0], res_pr[1], res_pr[3]) if res_pr \
        else (0.0, 0.0, 0.0)
    print("Precision:%f Recall:%f AP:%f F1:%f" % (precision, recall, ap, f1))


if __name__ == "__main__":
    main()
