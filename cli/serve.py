#!/usr/bin/env python
"""HTTP detection server CLI (the production front end over the serving
pipelines — see fastdet/server.py).

Usage:
  python cli/serve.py --data data/coco.data --weights weights/coco.npz \
                      --port 8000 --batch 32 --max-wait-ms 5

  curl -X POST --data-binary @img/000139.jpg http://127.0.0.1:8000/detect
  curl http://127.0.0.1:8000/stats

The reference has no serving component (its deployment endpoint is the
one-shot ncnn demo binary, sample/ncnn/demo.cpp); this CLI is the
TPU-native serving analog: dynamic batching keeps the chip running full
fixed-shape batches while requests arrive singly.
"""

import argparse
import os

import _bootstrap  # noqa: F401


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=str, default="",
                        help="Specify training profile *.data")
    parser.add_argument("--weights", type=str, default="",
                        help="The path of the model weights (.npz/.pth/dir)")
    parser.add_argument("--model", type=str, default="yolo-fastestv2",
                        help="model family: yolo-fastestv2 | anchorfree")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--batch", type=int, default=32,
                        help="dynamic-batching max batch size")
    parser.add_argument("--max-wait-ms", type=float, default=5.0,
                        help="max time the oldest queued request waits "
                             "before a partial batch dispatches")
    parser.add_argument("--conf", type=float, default=0.3)
    parser.add_argument("--nms", type=float, default=0.4)
    parser.add_argument("--pipeline", type=str, default="fused",
                        choices=["fused", "device"],
                        help="fused = Pallas fused serving path (TPU); "
                             "device = plain-XLA DevicePipeline")
    parser.add_argument("--verbose", action="store_true",
                        help="log each HTTP request")
    opt = parser.parse_args()

    from fastdet.config import Config, load_names, resolve_path
    cfg = Config.from_file(opt.data)
    assert os.path.exists(opt.weights), "invalid weights path"

    import jax
    import jax.numpy as jnp
    from fastdet.io import load_variables
    from fastdet.server import InferenceServer
    variables = jax.tree.map(jnp.asarray, load_variables(opt.weights))

    on_tpu = jax.default_backend() == "tpu"
    if opt.pipeline == "fused":
        from fastdet.serve import FusedPipeline
        pipe = FusedPipeline(variables, cfg, conf_thres=opt.conf,
                             iou_thres=opt.nms,
                             dtype=jnp.bfloat16 if on_tpu else jnp.float32,
                             interpret=not on_tpu, family=opt.model)
    else:
        from fastdet.models.registry import get_family
        from fastdet.serve import DevicePipeline
        family = get_family(opt.model, cfg)
        pipe = DevicePipeline(family.model, variables, cfg,
                              conf_thres=opt.conf, iou_thres=opt.nms)

    names_path = resolve_path(cfg.names, opt.data)
    names = load_names(names_path) \
        if names_path and os.path.exists(names_path) else None

    # warm every batch bucket so no request ever hits a 20-40 s compile
    # (InferenceServer pads coalesced batches to power-of-two buckets)
    import numpy as np
    b = 1
    while True:
        print("compiling the %s detect program (batch=%d)..."
              % (opt.pipeline, b))
        pipe(np.zeros((b, cfg.height, cfg.width, 3), np.uint8))
        if b >= opt.batch:
            break
        b *= 2

    server = InferenceServer(pipe, cfg, names=names, max_batch=opt.batch,
                             max_wait_ms=opt.max_wait_ms,
                             model_name=opt.model)
    server.serve_forever(opt.host, opt.port, quiet=not opt.verbose)


if __name__ == "__main__":
    main()
