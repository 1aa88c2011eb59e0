#!/usr/bin/env python
"""Sub-stage timing for the postprocess+NMS tail of the fused detect
path (docs/PERF.md §1's last row, VERDICT r3 #2).

Times cumulative prefixes of `fastdet.ops.postprocess.postprocess` via
its `_upto` hook (forward → +scores → +sort → +decode → +NMS-keep →
full with compaction) under the same carried-sum chain harness as
tools/perf_breakdown.py, and differences them into per-sub-stage
µs/img.  Run on the TPU host:

    python tools/pp_breakdown.py [--batch 128] [--max-nms 256]
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
    ap.add_argument("--chain", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--max-nms", type=int, default=256)
    ap.add_argument("--conf", type=float, default=0.3)
    ap.add_argument("--iou", type=float, default=0.4)
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
    from fastdet.kernels.fused_infer import build_fused_forward
    from fastdet.ops.postprocess import postprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config.from_file(os.path.join(repo, "data", "coco.data"))
    variables = jax.tree.map(jnp.asarray, load_npz_variables(
        os.path.join(repo, "weights", "coco2017-ref.npz")))
    anchors = jnp.asarray(np.asarray(cfg.anchors, np.float32).reshape(
        cfg.num_scales, cfg.anchor_num, 2))
    hw = (cfg.height, cfg.width)
    npad = ((hw[0] // 4) * (hw[1] // 4) + 127) // 128 * 128

    b, chain = args.batch, args.chain
    imgs_k = jax.jit(lambda k: jax.random.randint(
        k, (chain, b, 48, npad), 0, 255, jnp.uint8))(jax.random.PRNGKey(0))
    imgs_k.block_until_ready()

    fwd, packed = build_fused_forward(variables, input_hw=hw,
                                      anchor_num=cfg.anchor_num,
                                      classes=cfg.classes,
                                      dtype=jnp.bfloat16,
                                      input_format="s2d_u8")

    def timed(fn):
        @jax.jit
        def chained(packed, images_k, anchors_arg):
            def body(c, im):
                out = fn(im, packed, anchors_arg)
                s = sum(jnp.sum(o.astype(jnp.float32)) for o in
                        (out if isinstance(out, (tuple, list)) else (out,)))
                return c + s, None
            s, _ = jax.lax.scan(body, jnp.float32(0), images_k)
            return s

        float(chained(packed, imgs_k, anchors))          # warm + compile
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(chained(packed, imgs_k, anchors))
            ts.append(time.perf_counter() - t0 - fetch_s)
        return min(ts) / (chain * b) * 1e6               # µs/img

    def make(upto, fused=None):
        def fn(im, p, a):
            outs = list(fwd(im, p))
            if upto == "fwd":
                return outs
            return postprocess(outs, a, hw, conf_thres=args.conf,
                               iou_thres=args.iou, max_nms=args.max_nms,
                               fused=fused,
                               _upto=None if upto.startswith("full")
                               else upto)
        return fn

    # the cumulative prefixes (_upto != None) always run the STAGED
    # path, so "full" is timed twice: staged-forced (differenced vs
    # "keep" = pure compaction cost on the same path) and fused (the
    # serving default — differenced vs full_staged, i.e. the row shows
    # the PATH SWITCH delta, negative when the fused kernel wins)
    rows = []
    prev = 0.0
    for upto in ("fwd", "scores", "prep", "sorted", "decoded", "keep",
                 "full_staged", "full_fused"):
        fused = {"full_staged": False, "full_fused": True}.get(upto)
        cum = timed(make(upto, fused))
        rows.append({"stage": upto, "cumulative_us": round(cum, 3),
                     "stage_us": round(cum - prev, 3)})
        prev = cum

    print(f"\npostprocess sub-stage breakdown (b{b} bf16, {hw[0]}², "
          f"chain {chain}, max_nms={args.max_nms}, min of {args.reps}):\n")
    print("| stage | cumul µs/img | stage µs/img |")
    print("|---|---|---|")
    for r in rows:
        print(f"| {r['stage']} | {r['cumulative_us']:.2f} "
              f"| {r['stage_us']:.2f} |")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"batch": b, "chain": chain,
                       "max_nms": args.max_nms, "stages": rows}, f,
                      indent=1)


if __name__ == "__main__":
    main()
