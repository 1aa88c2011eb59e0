#!/usr/bin/env python
"""Per-stage timing + HBM-roofline accounting for the fused detect path.

Times cumulative program prefixes (stem → stage2 → stage3 → stage4 →
FPN+heads → +postprocess/NMS) with the carried-sum chain harness (every
step's output feeds the carry, so steps serialize and per-step time is
honest), then differences them into per-stage µs/img and compares each
stage against a minimum-HBM-traffic roofline (activations in + out at
the stage boundary; weights are VMEM-resident and amortized over the
batch).  Results feed docs/PERF.md.

Run on the TPU host:  python tools/perf_breakdown.py [--batch 256]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# v5e peak numbers for the roofline columns
HBM_GBPS = 819.0
MXU_BF16_TFLOPS = 197.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--chain", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--input-format", default="s2d_u8",
                    choices=["s2d_u8", "s2d8_u8"],
                    help="s2d8_u8 = phase-packed stem feeding stage 2 "
                         "directly (no phase-split permute)")
    ap.add_argument("--fuse-s2", action="store_true",
                    help="stages as single s2span Pallas programs")
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.device_get(jnp.zeros((8, 128)))   # axon handshake
    # fixed device->host fetch overhead, subtracted from every rep (the
    # timed loops end in a real scalar fetch — block_until_ready acks
    # are not trustworthy under the relay; see bench.py)
    probe = jax.device_put(jnp.zeros((8, 128)))
    fts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_get(probe)
        fts.append(time.perf_counter() - t0)
    fetch_s = float(np.median(fts))
    # ... and the FIXED dispatch→fetch round-trip the relay charges per
    # timed rep (~26-32 ms; measured with a null program — see bench.py
    # null_rtt_ms).  Subtracting it makes the per-stage cums honest; the
    # stage DIFFERENCES were already clean (the constant cancels).
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
    from fastdet.kernels.fused_infer import build_fused_forward
    from fastdet.ops.postprocess import postprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config.from_file("/root/reference/data/coco.data"
                           if not os.path.exists(
                               os.path.join(repo, "data", "coco.data"))
                           else os.path.join(repo, "data", "coco.data"))
    from fastdet.io.torch_convert import load_npz_variables
    variables = jax.tree.map(jnp.asarray, load_npz_variables(
        os.path.join(repo, "weights", "coco2017-ref.npz")))
    anchors = jnp.asarray(np.asarray(cfg.anchors, np.float32).reshape(
        cfg.num_scales, cfg.anchor_num, 2))
    hw = (cfg.height, cfg.width)
    h4, w4 = hw[0] // 4, hw[1] // 4
    npad = (h4 * w4 + 127) // 128 * 128

    b, chain = args.batch, args.chain
    if args.input_format == "s2d8_u8":
        h8w8 = (hw[0] // 8) * (hw[1] // 8)
        in_shape = (192, (h8w8 + 127) // 128 * 128)
    else:
        in_shape = (48, npad)
    # generated on device: dev-tunnel device_put runs at ~5-30 MB/s
    imgs_k = jax.jit(lambda k: jax.random.randint(
        k, (chain, b) + in_shape, 0, 255, jnp.uint8))(jax.random.PRNGKey(0))
    imgs_k.block_until_ready()

    def timed(fn):
        """Chained run; carry sums the (reduced) output to serialize."""
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
            float(chained(packed, imgs_k, anchors))      # real fetch
            ts.append(time.perf_counter() - t0 - fetch_s)
        return min(ts) / (chain * b) * 1e6      # µs/img

    stages = []
    packed = None
    for name in ("stem", "s2", "s3", "s4", None):
        fwd, pk = build_fused_forward(variables, input_hw=hw,
                                      anchor_num=cfg.anchor_num,
                                      classes=cfg.classes,
                                      dtype=jnp.bfloat16,
                                      input_format=args.input_format,
                                      fuse_s2=args.fuse_s2, upto=name)
        if packed is None:
            packed = pk
        stages.append((name or "fpn+heads",
                       timed(lambda im, p, a: fwd(im, p))))

    def full_detect(im, p, a):
        outs = list(build_full(im, p))
        return postprocess(outs, a, hw, conf_thres=0.3, iou_thres=0.4,
                           max_nms=256)

    build_full, _ = build_fused_forward(variables, input_hw=hw,
                                        anchor_num=cfg.anchor_num,
                                        classes=cfg.classes,
                                        dtype=jnp.bfloat16,
                                        input_format=args.input_format,
                                        fuse_s2=args.fuse_s2)
    stages.append(("detect(+post/NMS)", timed(full_detect)))

    # minimum HBM traffic per image at each stage boundary (bytes):
    # stage input activations read + output written, bf16 except u8 in
    h8, w8 = h4 // 2, w4 // 2
    h16, w16 = h8 // 2, w8 // 2
    h32, w32 = h16 // 2, w16 // 2
    act = {
        "in": 48 * npad,                          # u8
        "stem": 24 * h4 * w4 * 2,
        "s2": 48 * h8 * w8 * 2,
        "s3": 96 * h16 * w16 * 2,
        "s4": 192 * h32 * w32 * 2,
        "heads": (h16 * w16 + h32 * w32) * (12 + 3 + cfg.classes) * 4,
    }
    min_bytes = {
        "stem": act["in"] + act["stem"],
        "s2": act["stem"] + act["s2"],
        "s3": act["s2"] + act["s3"],
        "s4": act["s3"] + act["s4"],
        "fpn+heads": act["s3"] + act["s4"] + act["heads"],
        "detect(+post/NMS)": act["heads"],
    }

    print(f"\nfused detect per-stage breakdown (b{b} bf16, {hw[0]}²,"
          f" chain {chain}, min of {args.reps}):\n")
    print("| stage | cumul µs/img | stage µs/img | min HBM KB/img | "
          "roof µs/img | % of roof |")
    print("|---|---|---|---|---|---|")
    rows = []
    prev = 0.0
    for name, cum in stages:
        stage_us = cum - prev
        mb = min_bytes.get(name, 0)
        roof_us = mb / (HBM_GBPS * 1e3)           # bytes/(GB/s·1e3)=µs
        pct = (roof_us / stage_us * 100) if stage_us > 0 else float("nan")
        print(f"| {name} | {cum:.2f} | {stage_us:.2f} | {mb / 1024:.0f} "
              f"| {roof_us:.2f} | {pct:.0f}% |")
        rows.append({"stage": name, "cumulative_us": round(cum, 3),
                     "stage_us": round(stage_us, 3),
                     "min_hbm_bytes": mb,
                     "hbm_roof_us": round(roof_us, 3),
                     "pct_of_roof": round(pct, 1)})
        prev = cum

    total = stages[-1][1]
    flops = 0.212e9
    mfu = flops / (total * 1e-6) / (MXU_BF16_TFLOPS * 1e12) * 100
    print(f"\ntotal {total:.2f} µs/img = {1e6 / total:,.0f} img/s/chip; "
          f"0.212 GFLOPs → {mfu:.1f}% MFU "
          f"(bandwidth/latency-bound by design — see docs/PERF.md)")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"batch": b, "chain": chain, "stages": rows,
                       "total_us_img": round(total, 3)}, f, indent=1)


if __name__ == "__main__":
    main()
