#!/usr/bin/env python
"""End-to-end training convergence check on synthetic data.

Generates a learnable detection task (solid colored rectangles on noise
backgrounds, class = color), trains a small Detector from scratch with
the full production train step, and evaluates mAP@0.5 as training
proceeds.  Passing bar: mAP rises from ~0 to >0.5.

Usage: python tools/convergence_check.py [--steps 600] [--eval_every 150]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_sample(rng, size=128, n_max=3):
    img = rng.randint(0, 80, (size, size, 3), np.uint8)
    n = rng.randint(1, n_max + 1)
    labels = []
    colors = [(220, 40, 40), (40, 220, 40), (40, 40, 220)]
    for _ in range(n):
        cls = rng.randint(0, 3)
        w = rng.randint(size // 8, size // 2)
        h = rng.randint(size // 8, size // 2)
        x1 = rng.randint(0, size - w)
        y1 = rng.randint(0, size - h)
        img[y1:y1 + h, x1:x1 + w] = colors[cls]
        labels.append([cls, (x1 + w / 2) / size, (y1 + h / 2) / size,
                       w / size, h / size])
    return img, np.asarray(labels, np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--eval_every", type=int, default=150)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=0.002)
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 activations in the train step (params "
                         "stay fp32) — validates bf16 training accuracy")
    ap.add_argument("--chain", type=int, default=1,
                    help="fuse K train steps into one device program")
    ap.add_argument("--model", type=str, default="yolo-fastestv2",
                    help="model family: yolo-fastestv2 | anchorfree")
    ap.add_argument("--save", type=str, default="",
                    help="save the final trained variables to this .npz "
                         "(the committed weights/anchorfree-synth.npz "
                         "artifact is produced this way)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fastdet.config import Config
    from fastdet.eval.runner import evaluate
    from fastdet.models.registry import get_family
    from fastdet.train.targets import pack_labels
    from fastdet.train.trainer import Trainer

    size = 128
    cfg = Config.from_dict({
        "classes": 3, "width": size, "height": size, "anchor_num": 3,
        "anchors": [20.0, 20.0, 36.0, 36.0, 52.0, 28.0,
                    28.0, 52.0, 56.0, 56.0, 80.0, 80.0],
        "learning_rate": args.lr, "steps": [10_000], "subdivisions": 1,
        "batch_size": args.batch, "epochs": 1})

    import jax.numpy as _jnp
    family = get_family(args.model, cfg,
                        dtype=_jnp.bfloat16 if args.bf16 else _jnp.float32)
    model = family.model
    # short warmup (5 "epochs" of 10 steps) so the run trains at full lr
    trainer = Trainer(model, cfg, steps_per_epoch=10,
                      compute_dtype=_jnp.bfloat16 if args.bf16
                      else _jnp.float32, loss_fn=family.loss_fn)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3)), train=False)
    state = trainer.init_state(variables)

    rng = np.random.RandomState(0)
    M = 8

    def make_batch(b):
        imgs, labs = zip(*(make_sample(rng, size) for _ in range(b)))
        lab_arr, mask = pack_labels(list(labs), M)
        return (jnp.asarray(np.stack(imgs)), jnp.asarray(lab_arr),
                jnp.asarray(mask))

    # fixed eval set
    eval_rng = np.random.RandomState(99)
    eval_imgs, eval_labs = zip(*(make_sample(eval_rng, size)
                                 for _ in range(64)))
    eval_lab_arr, eval_mask = pack_labels(list(eval_labs), M)
    eval_imgs = np.stack(eval_imgs)
    detect = family.build_detect_fn(conf_thres=0.05, iou_thres=0.45)

    def eval_ap(state):
        ev = {"params": state.params, "batch_stats": state.batch_stats}

        def batches():
            for i in range(0, len(eval_imgs), 32):
                yield (jnp.asarray(eval_imgs[i:i + 32]),
                       eval_lab_arr[i:i + 32], eval_mask[i:i + 32])

        res = evaluate(detect, ev, batches(), (size, size))
        return res[2] if res else 0.0

    chained = trainer.make_chained_step(args.chain) if args.chain > 1 \
        else None
    aps = [eval_ap(state)]
    print(f"step 0: mAP@0.5 = {aps[-1]:.4f}", flush=True)
    t0 = time.time()
    step = 0
    while step < args.steps:
        if chained is not None and step + args.chain <= args.steps \
                and (step % args.eval_every) + args.chain <= args.eval_every:
            parts = [make_batch(args.batch) for _ in range(args.chain)]
            stacked = tuple(jnp.stack(x) for x in zip(*parts))
            state, mk = chained(state, *stacked)
            metrics = {k: v[-1] for k, v in mk.items()}
            step += args.chain
        else:
            batch = make_batch(args.batch)
            state, metrics = trainer.step(state, *batch)
            step += 1
        if step % 50 == 0:
            print(f"step {step}: loss={float(metrics['total']):.3f} "
                  f"lr={float(metrics['lr']):.5f}", flush=True)
        if step % args.eval_every == 0:
            aps.append(eval_ap(state))
            print(f"step {step}: mAP@0.5 = {aps[-1]:.4f}", flush=True)

    dt = time.time() - t0
    print(f"trained {args.steps} steps in {dt:.0f}s "
          f"({args.steps * args.batch / dt:.0f} img/s)", flush=True)
    print("AP curve:", [round(a, 4) for a in aps], flush=True)
    ok = aps[-1] > 0.5 and aps[-1] > aps[0]
    if args.save:
        from fastdet.io.torch_convert import save_npz_variables
        save_npz_variables(
            {"params": jax.device_get(state.params),
             "batch_stats": jax.device_get(state.batch_stats)}, args.save)
        print(f"saved {args.save}", flush=True)
    print("CONVERGENCE", "OK" if ok else "FAILED", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
