#!/usr/bin/env python
"""Benchmark: fused inference throughput (forward + anchor decode + NMS).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "img/s/chip", "vs_baseline": N}

The baseline for vs_baseline is the BASELINE.json target of 5,000
images/sec/chip fused inference at 352×352 (the reference itself has no
TPU number; its 3.29 ms Kirin-990 latency ≈ 304 img/s).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    # axon-tunnel calibration: until a process completes one device->host
    # transfer, block_until_ready acks do NOT imply device completion and
    # timings read absurdly fast.  One real fetch switches the runtime
    # into its synchronous dispatch path, after which block-per-iteration
    # timing is honest.  The first fetch can itself block for minutes, so
    # it runs in a daemon thread with a timeout; on normal TPU hardware it
    # completes instantly.
    import threading
    fetched = threading.Event()

    def _warm_fetch():
        jax.device_get(jnp.zeros((8, 128)))
        fetched.set()

    t = threading.Thread(target=_warm_fetch, daemon=True)
    t.start()
    t.join(timeout=float(os.environ.get("FASTDET_BENCH_FETCH_TIMEOUT",
                                        "600")))
    sync_mode = fetched.is_set()

    from fastdet.config import Config
    from fastdet.models import Detector
    from fastdet.ops.postprocess import build_detect_fn

    repo = os.path.dirname(os.path.abspath(__file__))
    cfg = Config.from_file(os.path.join(repo, "data", "coco.data")) \
        if os.path.exists(os.path.join(repo, "data", "coco.data")) \
        else Config.from_file("/root/reference/data/coco.data")

    model = Detector(classes=cfg.classes, anchor_num=cfg.anchor_num,
                     dtype=jnp.bfloat16)

    npz = os.path.join(repo, "weights", "coco2017-ref.npz")
    if os.path.exists(npz):
        from fastdet.io.torch_convert import load_npz_variables
        variables = jax.tree.map(jnp.asarray, load_npz_variables(npz))
    else:
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, cfg.height, cfg.width, 3)),
                               train=False)

    # serving-tuned: conf 0.3 rarely yields >100 candidates per image, so
    # a 256-candidate NMS window is lossless in practice and 16x cheaper
    # than the eval-grade 1024 window
    detect = build_detect_fn(model, cfg, conf_thres=0.3, iou_thres=0.4,
                             max_nms=256, dtype=jnp.bfloat16)

    # Throughput pipeline: a lax.scan chains CHAIN batches inside ONE
    # program, the way a saturated serving loop feeds the chip — this
    # measures the chip, not per-dispatch host/runtime overhead (which is
    # ~30 ms under the axon relay).  B=256 is the measured VMEM-locality
    # sweet spot for this net.
    batch = int(os.environ.get("FASTDET_BENCH_BATCH", "256"))
    chain = int(os.environ.get("FASTDET_BENCH_CHAIN", "32"))
    iters = int(os.environ.get("FASTDET_BENCH_ITERS", "5"))

    from fastdet.ops.postprocess import postprocess
    anchors = jnp.asarray(
        np.asarray(cfg.anchors, np.float32).reshape(cfg.num_scales,
                                                    cfg.anchor_num, 2))

    @jax.jit
    def detect_chain(variables, images_k, anchors_arg):
        def body(_, imgs):
            x = imgs.astype(jnp.bfloat16) / jnp.asarray(255., jnp.bfloat16)
            outs = [o.astype(jnp.float32)
                    for o in model.apply(variables, x, train=False)]
            return None, postprocess(outs, anchors_arg,
                                     (cfg.height, cfg.width),
                                     conf_thres=0.3, iou_thres=0.4,
                                     max_nms=256)
        _, outs = jax.lax.scan(body, None, images_k)
        return outs

    rng = np.random.RandomState(0)
    imgs_k = jax.device_put(jnp.asarray(rng.randint(
        0, 255, (chain, batch, cfg.height, cfg.width, 3), np.uint8)))

    jax.block_until_ready(detect_chain(variables, imgs_k, anchors))

    # p50 latency, batch 1 (single dispatch — includes transport overhead)
    img1 = jax.device_put(jnp.asarray(
        rng.randint(0, 255, (1, cfg.height, cfg.width, 3), np.uint8)))
    jax.block_until_ready(detect(variables, img1))
    lat = []
    for _ in range(30):
        t0 = time.perf_counter()
        jax.block_until_ready(detect(variables, img1))
        lat.append(time.perf_counter() - t0)
    p50_ms = float(np.median(lat) * 1e3)

    # throughput: block every iteration; results stay on device (no
    # device_get — under the axon relay, blocking only on the final
    # dispatch under-reports because acks don't imply execution order)
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(detect_chain(variables, imgs_k, anchors))
    dt = (time.perf_counter() - t0) / iters
    img_per_s = chain * batch / dt

    result = {
        "metric": "fused_inference_images_per_sec_per_chip_352",
        "value": round(float(img_per_s), 1),
        "unit": "img/s/chip",
        "vs_baseline": round(float(img_per_s) / 5000.0, 3),
        "batch": batch,
        "chain": chain,
        "p50_latency_ms_b1": round(p50_ms, 3),
        "backend": jax.default_backend(),
        "sync_verified": bool(sync_mode),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
