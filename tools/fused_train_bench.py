#!/usr/bin/env python
"""Training-path throughput comparison: linen/XLA step vs the Pallas
custom-VJP fused backbone (VERDICT r4 #4), on the real TPU.

Times the FULL train step (fwd + bwd + SGD + bookkeeping) through
`Trainer.make_chained_step` for three forward paths:

  * xla      — default linen forward + XLA autodiff (docs/PERF.md §2:
               92.8 µs/img, 10.8k img/s at b128 bf16);
  * fused    — custom-VJP span kernels (ghost BN), NHWC uint8 input,
               XLA stem;
  * fused_s2d — same spans + the fused custom-VJP STEM from the s2d(4)
               uint8 host layout (fastdet/kernels/stem_train.py) — the
               stem was the breakdown's single largest train cost
               (30.9 µs/img unfused).

Same carried-chain harness as tools/train_breakdown.py (fetch-forced,
null-RTT-corrected, min of reps).  Run on the TPU host:

    python tools/fused_train_bench.py [--batch 128] [--chain 32]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--chain", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--paths", default="xla,fused,fused_s2d")
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.device_get(jnp.zeros((8, 128)))       # axon handshake
    null = jax.jit(lambda x: x + 1.0)
    v = jnp.float32(0)
    float(null(v))
    rtts = []
    for _ in range(8):
        t0 = time.perf_counter()
        float(null(v))
        rtts.append(time.perf_counter() - t0)
    fetch_s = float(min(rtts))

    from fastdet.config import Config
    from fastdet.io.torch_convert import load_npz_variables
    from fastdet.models.detector import Detector
    from fastdet.train.trainer import Trainer

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config.from_file(os.path.join(repo, "data", "coco.data"))
    variables = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32),
        load_npz_variables(os.path.join(repo, "weights",
                                        "coco2017-ref.npz")))
    hw = (cfg.height, cfg.width)
    b, chain = args.batch, args.chain
    npad = ((hw[0] // 4) * (hw[1] // 4) + 127) // 128 * 128

    tcfg = Config.from_dict({
        "classes": cfg.classes, "width": cfg.width, "height": cfg.height,
        "anchor_num": cfg.anchor_num,
        "anchors": list(np.asarray(cfg.anchors, np.float32)),
        "learning_rate": 1e-3, "steps": [10_000], "subdivisions": 1,
        "batch_size": b, "epochs": 1})
    model = Detector(classes=cfg.classes, anchor_num=cfg.anchor_num,
                     dtype=jnp.bfloat16)

    labs = np.zeros((chain, b, 8, 5), np.float32)
    labs[..., 0, :] = [1, 0.5, 0.5, 0.3, 0.3]
    mask = np.zeros((chain, b, 8), bool)
    mask[..., 0] = True
    labs_k, mask_k = jnp.asarray(labs), jnp.asarray(mask)
    imgs_nhwc = jax.jit(lambda k: jax.random.randint(
        k, (chain, b, hw[0], hw[1], 3), 0, 255, jnp.uint8))(
            jax.random.PRNGKey(0))
    imgs_s2d = jax.jit(lambda k: jax.random.randint(
        k, (chain, b, 48, npad), 0, 255, jnp.uint8))(jax.random.PRNGKey(1))
    jax.block_until_ready((imgs_nhwc, imgs_s2d))

    def measure(name, fused, fmt, imgs_k):
        trainer = Trainer(model, tcfg, steps_per_epoch=100,
                          compute_dtype=jnp.bfloat16,
                          fused_backbone=fused, fused_input_format=fmt)
        # fresh param copy per path — the chained step donates its
        # state, which would delete arrays shared with `variables`
        state = trainer.init_state(jax.tree.map(jnp.copy, variables))
        chained = trainer.make_chained_step(chain)

        state_box = [state]

        def run():
            s2, mk = chained(state_box[0], imgs_k, labs_k, mask_k)
            state_box[0] = s2
            jax.device_get(mk["total"][-1:])

        t0 = time.perf_counter()
        run()                                        # warm + compile
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0 - fetch_s)
        us = min(ts) / (chain * b) * 1e6
        total = float(jax.device_get(
            chained(state_box[0], imgs_k, labs_k, mask_k)[1]["total"][-1]))
        return {"path": name, "us_per_img": round(us, 2),
                "img_s": round(1e6 / us, 1),
                "compile_s": round(compile_s, 1),
                "final_loss": round(total, 4)}

    specs = {"xla": (False, "nhwc", imgs_nhwc),
             "fused": (True, "nhwc", imgs_nhwc),
             "fused_s2d": (True, "s2d_u8", imgs_s2d)}
    rows = []
    for name in args.paths.split(","):
        fused, fmt, imgs_k = specs[name]
        r = measure(name, fused, fmt, imgs_k)
        rows.append(r)
        print(f"{name:10s} {r['us_per_img']:8.2f} µs/img  "
              f"{r['img_s']:10.1f} img/s  compile {r['compile_s']:.0f}s  "
              f"loss {r['final_loss']}", flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"batch": b, "chain": chain,
                       "null_rtt_ms": fetch_s * 1e3, "rows": rows}, f,
                      indent=1)


if __name__ == "__main__":
    main()
