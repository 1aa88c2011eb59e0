#!/usr/bin/env python
"""Per-piece timing for the training step (VERDICT r3 #4).

Decomposes `train_img_s`'s ~µs/img into:

  * targets+loss — `compute_loss` alone on FIXED forward outputs
    (target building + CIoU/BCE/CE reductions, no network);
  * fwd+loss     — loss value only (forward incl. BN stats + the above);
  * fwd+bwd      — `jax.value_and_grad` of the same (adds the backward
    pass); bwd ≈ this minus fwd+loss;
  * optimizer    — SGD momentum + weight-decay update on fixed grads
    (tx.update + apply_updates, f32 master params);
  * full step    — the real chained `Trainer` step (adds state
    bookkeeping / donation plumbing).

Each piece runs under the carried chain harness of
tools/perf_breakdown.py (scan serializes steps; timed loop ends in a
real fetch, fixed relay RTT subtracted).  Results feed docs/PERF.md §2.

Run on the TPU host:  python tools/train_breakdown.py [--batch 128]
"""

import argparse
import functools
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
    from fastdet.train.loss import compute_loss
    from fastdet.train.trainer import Trainer, make_optimizer

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = Config.from_file(os.path.join(repo, "data", "coco.data"))
    variables = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32),
        load_npz_variables(os.path.join(repo, "weights",
                                        "coco2017-ref.npz")))
    anchors = jnp.asarray(np.asarray(cfg.anchors, np.float32).reshape(
        cfg.num_scales, cfg.anchor_num, 2))
    hw = (cfg.height, cfg.width)
    b, chain = args.batch, args.chain
    dtype = jnp.bfloat16

    model = Detector(classes=cfg.classes, anchor_num=cfg.anchor_num,
                     dtype=dtype)
    imgs_k = jax.jit(lambda k: jax.random.randint(
        k, (chain, b, hw[0], hw[1], 3), 0, 255, jnp.uint8))(
            jax.random.PRNGKey(0))
    imgs_k.block_until_ready()
    labs = np.zeros((chain, b, 8, 5), np.float32)
    labs[..., 0, :] = [1, 0.5, 0.5, 0.3, 0.3]
    mask = np.zeros((chain, b, 8), bool)
    mask[..., 0] = True
    labs_k, mask_k = jnp.asarray(labs), jnp.asarray(mask)

    def timed(run):
        run()                                        # warm + compile
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0 - fetch_s)
        return min(ts) / (chain * b) * 1e6           # µs/img

    def loss_fn(params, batch_stats, images, labels, lmask):
        x = images.astype(dtype) / jnp.asarray(255.0, dtype)
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, x,
            train=True, mutable=["batch_stats"])
        total, comps = compute_loss(outputs, labels, lmask, anchors, hw)
        return total, (comps, mutated["batch_stats"])

    params = variables["params"]
    stats = variables["batch_stats"]

    # -- targets+loss on fixed outputs (forward excluded) ------------
    fwd = jax.jit(lambda p, s, im: model.apply(
        {"params": p, "batch_stats": s},
        im.astype(dtype) / jnp.asarray(255.0, dtype), train=True,
        mutable=["batch_stats"])[0])
    outs0 = jax.tree.map(jnp.asarray, fwd(params, stats, imgs_k[0]))
    jax.block_until_ready(outs0)

    @jax.jit
    def loss_only_chain(outs, labels_k, mask_k2):
        def body(c, xs):
            lb, mk = xs
            # carry perturbs one operand so scan steps serialize
            o = [outs[0] + c] + list(outs[1:])
            total, _ = compute_loss(o, lb, mk, anchors, hw)
            return total * 0.0, total
        _, tot = jax.lax.scan(body, jnp.float32(0), (labels_k, mask_k2))
        return tot[-1]

    t_loss = timed(lambda: float(loss_only_chain(outs0, labs_k, mask_k)))

    # -- forward + loss (value only) ---------------------------------
    @jax.jit
    def fwd_loss_chain(p, s, images_k, labels_k, mask_k2):
        def body(c, xs):
            im, lb, mk = xs
            total, _ = loss_fn(p, s, im, lb, mk)
            return c + total, total
        _, tot = jax.lax.scan(body, jnp.float32(0),
                              (images_k, labels_k, mask_k2))
        return tot[-1]

    t_fwd = timed(lambda: float(
        fwd_loss_chain(params, stats, imgs_k, labs_k, mask_k)))

    # -- forward + backward ------------------------------------------
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @jax.jit
    def grad_chain(p, s, images_k, labels_k, mask_k2):
        def body(c, xs):
            im, lb, mk = xs
            (total, _), grads = grad_fn(p, s, im, lb, mk)
            gs = sum(jnp.sum(g.astype(jnp.float32))
                     for g in jax.tree.leaves(grads))
            return c + total + gs, None
        # return the CARRY (not per-step outputs): it transitively
        # depends on every step's grads, so XLA cannot DCE the backward
        c_fin, _ = jax.lax.scan(body, jnp.float32(0),
                                (images_k, labels_k, mask_k2))
        return c_fin

    t_bwd = timed(lambda: float(
        grad_chain(params, stats, imgs_k, labs_k, mask_k)))

    # -- optimizer update on fixed grads -----------------------------
    tx = make_optimizer()
    opt0 = tx.init(params)
    grads0 = jax.tree.map(jnp.ones_like, params)

    @functools.partial(jax.jit, static_argnums=(3,))
    def opt_chain(p, opt, grads, n):
        import optax

        def body(carry, _):
            p2, o2 = carry
            updates, o3 = tx.update(grads, o2, p2)
            updates = jax.tree.map(lambda u: -1e-3 * u, updates)
            return (optax.apply_updates(p2, updates), o3), None
        (p4, _), _ = jax.lax.scan(body, (p, opt), None, length=n)
        return jax.tree.leaves(p4)[0].ravel()[0]

    t_opt = timed(lambda: float(
        opt_chain(params, opt0, grads0, chain)))

    # -- full chained Trainer step -----------------------------------
    tcfg = Config.from_dict({
        "classes": cfg.classes, "width": cfg.width, "height": cfg.height,
        "anchor_num": cfg.anchor_num,
        "anchors": list(np.asarray(cfg.anchors, np.float32)),
        "learning_rate": 1e-3, "steps": [10_000], "subdivisions": 1,
        "batch_size": b, "epochs": 1})
    trainer = Trainer(model, tcfg, steps_per_epoch=100,
                      compute_dtype=dtype)
    state = trainer.init_state(variables)
    chained = trainer.make_chained_step(chain)
    holder = {"state": state}

    def run_full():
        holder["state"], mk = chained(holder["state"], imgs_k, labs_k,
                                      mask_k)
        jax.device_get(mk["total"][-1:])

    t_full = timed(run_full)

    rows = [
        ("targets+loss (fixed outputs)", t_loss),
        ("fwd+loss", t_fwd),
        ("fwd+bwd", t_bwd),
        ("optimizer (fixed grads)", t_opt),
        ("full step", t_full),
    ]
    print(f"\ntrain-step breakdown (b{b} bf16, {hw[0]}², chain {chain}, "
          f"min of {args.reps}):\n")
    print("| piece | µs/img |")
    print("|---|---|")
    for name, us in rows:
        print(f"| {name} | {us:.2f} |")
    print(f"\nderived: forward≈{t_fwd - t_loss:.2f}, "
          f"backward≈{t_bwd - t_fwd:.2f}, "
          f"step-overhead≈{t_full - t_bwd - t_opt:.2f} µs/img; "
          f"full step = {1e6 / t_full:,.0f} img/s/chip")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"batch": b, "chain": chain,
                       "pieces": {n: round(u, 3) for n, u in rows}},
                      f, indent=1)


if __name__ == "__main__":
    main()
