#!/usr/bin/env python
"""Training CLI (argparse parity with the reference train.py).

Behavioral parity: .data-driven config, finetune from `pre_weights` when
the path exists, SGD m=0.949 wd=5e-4, quartic warmup over 5 epochs of
batches + multistep ×0.1 decay, gradient accumulation via
`subdivisions`, per-batch loss/LR progress line, and every 10th epoch an
mAP + P/R/F1 evaluation with an AP-stamped weights save
(weights/{name}-{epoch}-epoch-{ap}ap-model.npz).

TPU-native differences: batches are sharded over a data mesh (all local
devices) inside one jitted train step; checkpoints are orbax
(params+opt_state+step, true resume) alongside the .npz weight export;
`--resume` continues from the latest orbax checkpoint.
"""

import argparse
import os
import time

import _bootstrap  # noqa: F401
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=str, default="",
                        help="Specify training profile *.data")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest orbax checkpoint")
    parser.add_argument("--ckpt_dir", type=str, default="checkpoints")
    parser.add_argument("--weights_dir", type=str, default="weights")
    parser.add_argument("--eval_every", type=int, default=10)
    parser.add_argument("--fused-backbone", action="store_true",
                        help="train the backbone through the Pallas "
                             "custom-VJP span/stem kernels (ghost BN in "
                             "the spans — see docs/PERF.md §2; yolo "
                             "family only)")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 activations in the forward pass")
    parser.add_argument("--chain", type=int, default=1,
                        help="fuse K train steps into one device program "
                             "(lax.scan) to amortize dispatch overhead; "
                             "leftover steps at epoch end run singly")
    parser.add_argument("--summary", action="store_true",
                        help="print the model parameter table at startup")
    parser.add_argument("--profile", type=str, default="",
                        help="capture a jax.profiler trace of a few steps "
                             "into this directory")
    parser.add_argument("--logdir", type=str, default="",
                        help="append per-step metrics to <logdir>/train.jsonl")
    parser.add_argument("--tb", action="store_true",
                        help="also write TensorBoard event files under "
                             "<logdir>/train_tb (requires --logdir)")
    parser.add_argument("--model", type=str, default="yolo-fastestv2",
                        help="model family: yolo-fastestv2 | anchorfree")
    parser.add_argument("--backbone", type=str, default="",
                        help="ImageNet-pretrained backbone weights "
                             "(.pth or .npz) to initialize from when not "
                             "finetuning (reference backbone.pth role)")
    opt = parser.parse_args()

    from fastdet.config import Config
    cfg = Config.from_file(opt.data)
    print("train config:")
    print(cfg.to_dict())

    import jax
    from fastdet.parallel.mesh import (initialize_distributed, make_mesh,
                                       shard_batch)
    # multi-host entry: FASTDET_COORDINATOR/_NUM_PROCESSES/_PROCESS_ID
    # env vars start a jax.distributed job (must precede any computation)
    if initialize_distributed():
        print(f"distributed: process {jax.process_index() + 1}"
              f"/{jax.process_count()}")
    import jax.numpy as jnp
    from fastdet.data import DarknetDataset, DataLoader, default_augment
    from fastdet.eval.runner import evaluate
    from fastdet.io import load_variables, save_checkpoint, load_checkpoint, latest_step
    from fastdet.train.trainer import Trainer

    train_ds = DarknetDataset(cfg.train, cfg.width, cfg.height,
                              augment=default_augment)
    val_ds = DarknetDataset(cfg.val, cfg.width, cfg.height, augment=None)

    # cfg.batch_size/subdivisions is the GLOBAL batch per optimizer
    # micro-step; each host loads and feeds 1/process_count of it
    global_bs = int(cfg.batch_size / (cfg.subdivisions or 1))
    nproc = jax.process_count()
    primary = jax.process_index() == 0
    assert global_bs % nproc == 0, \
        f"batch_size/subdivisions ({global_bs}) must divide evenly over " \
        f"{nproc} processes"
    batch_size = global_bs // nproc          # per-host loader batch
    nw = min(os.cpu_count() or 1, batch_size if batch_size > 1 else 1, 8)
    # multi-host: each process loads only its shard of the dataset
    # (per-host input pipeline, SURVEY.md §5)
    shard = ((jax.process_index(), nproc) if nproc > 1 else None)
    if shard is not None:
        print(f"input shard {shard[0] + 1}/{shard[1]}")
    train_loader = DataLoader(train_ds, batch_size, shuffle=True,
                              drop_last=True, num_workers=nw, shard=shard)
    val_loader_args = dict(batch_size=batch_size, shuffle=False,
                           drop_last=False, num_workers=nw, shard=shard)

    # DP mesh: multi-process jobs span every device of every process
    # (the global batch shards across hosts); single-process jobs take
    # as many local devices as evenly divide the batch
    import math
    if nproc > 1:
        n_dp = len(jax.devices())
        assert global_bs % n_dp == 0, \
            f"global batch {global_bs} must divide over {n_dp} devices"
        mesh = make_mesh()
    else:
        n_dp = math.gcd(len(jax.devices()), batch_size)
        mesh = make_mesh(n_dp) if n_dp > 1 else None
    if mesh is not None:
        print(f"data-parallel mesh over {n_dp} devices")
    from fastdet.models.registry import get_family
    # the model's own dtype drives conv/BN compute; without it --bf16
    # only cast the input and XLA promoted everything back to f32
    family = get_family(opt.model, cfg,
                        dtype=jnp.bfloat16 if opt.bf16 else jnp.float32)
    # eval stays f32 (eval-grade metrics for the AP-stamped saves)
    eval_family = get_family(opt.model, cfg) if opt.bf16 else family
    model = family.model
    if opt.fused_backbone and opt.model != "yolo-fastestv2":
        raise SystemExit("--fused-backbone supports the yolo-fastestv2 "
                         "family only")
    trainer = Trainer(model, cfg, steps_per_epoch=len(train_loader),
                      mesh=mesh,
                      compute_dtype=jnp.bfloat16 if opt.bf16 else jnp.float32,
                      loss_fn=family.loss_fn,
                      fused_backbone=opt.fused_backbone)

    # init / finetune / resume.  pre_weights merges with strict=False
    # semantics (reference train.py:76): matching tensors load, the rest
    # (e.g. heads with a different class count) keep fresh init.
    from fastdet.io import merge_variables
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, cfg.height, cfg.width, 3)),
                           train=False)
    if cfg.pre_weights and os.path.exists(cfg.pre_weights):
        pre = load_variables(cfg.pre_weights)
        variables, n_load, n_keep = merge_variables(variables, pre)
        print("Load finetune model param: %s (%d tensors loaded, %d fresh)"
              % (cfg.pre_weights, n_load, n_keep))
    elif opt.backbone and os.path.exists(opt.backbone):
        from fastdet.io.torch_convert import load_torch_weights
        bb = (load_torch_weights(opt.backbone, backbone_only=True)
              if opt.backbone.endswith((".pth", ".pt"))
              else load_variables(opt.backbone))
        if "backbone" not in bb.get("params", {}):
            bb = {"params": {"backbone": bb["params"]},
                  "batch_stats": {"backbone": bb["batch_stats"]}}
        variables, n_load, n_keep = merge_variables(variables, bb)
        print("Initialize backbone from %s (%d tensors loaded)"
              % (opt.backbone, n_load))
    else:
        print("Initialize weights randomly (no pre_weights)")
    variables = jax.tree.map(jnp.asarray, variables)
    if opt.summary:
        from fastdet.utils import summarize_model
        print(summarize_model(model, variables,
                              (1, cfg.height, cfg.width, 3)))
    state = trainer.init_state(variables)

    from fastdet.utils import MetricsLogger, StepTimer, trace
    # host files (metrics jsonl, npz weights) are written by process 0
    # only; orbax checkpoints coordinate across processes internally
    mlog = MetricsLogger((opt.logdir or None) if primary else None, "train",
                         tensorboard=opt.tb)
    timer = StepTimer()

    start_epoch = 0
    if opt.resume:
        step = latest_step(opt.ckpt_dir)
        if step is not None:
            state = load_checkpoint(opt.ckpt_dir, step, target=state)
            start_epoch = int(step)
            print(f"Resumed from epoch {start_epoch}")

    os.makedirs(opt.weights_dir, exist_ok=True)
    # mAP at conf 0.01 keeps nearly every candidate: full-coverage NMS
    # window (the model emits 1,815 cells/image; reference caps at 30k)
    detect_map = eval_family.build_detect_fn(conf_thres=0.01, iou_thres=0.4,
                                        max_nms=2048)
    detect_pr = eval_family.build_detect_fn(conf_thres=0.3, iou_thres=0.4)

    chain_k = max(1, opt.chain)
    chained_step = trainer.make_chained_step(chain_k) if chain_k > 1 else None
    if chained_step is not None:
        from fastdet.parallel.mesh import shard_chained_batch
        print(f"chaining {chain_k} train steps per device program")

    print("Starting training for %g epochs..." % cfg.epochs)
    spe = len(train_loader)
    for epoch in range(start_epoch, cfg.epochs):
        t_epoch = time.time()
        # epoch-keyed shuffle: deterministic across --resume and
        # identical on every host of a multi-host job
        train_loader.set_epoch(epoch)
        pending = []   # host batches awaiting a full chain of K

        def run_single(batch_np):
            batch = tuple(jnp.asarray(x) for x in batch_np)
            if mesh is not None:
                batch = shard_batch(mesh, batch)
            return trainer.step(state, *batch)

        def run_chain(batches_np):
            stacked = tuple(np.stack(parts) for parts in zip(*batches_np))
            if mesh is not None:
                stacked = shard_chained_batch(mesh, stacked)
            else:
                stacked = tuple(jnp.asarray(x) for x in stacked)
            new_state, metrics_k = chained_step(state, *stacked)
            # report the last step of the chain
            return new_state, {k: v[-1] for k, v in metrics_k.items()}

        def log_progress(i, metrics):
            if i % 10 == 0 or i == spe - 1:
                m = {k: float(v) for k, v in metrics.items()}
                mlog.log(int(state.step), m)
                print("Epoch:%d %d/%d LR:%f CIou:%f Obj:%f Cls:%f Total:%f"
                      % (epoch, i, spe, m["lr"], m["box"], m["obj"],
                         m["cls"], m["total"]), flush=True)

        for i, (images, labels, mask) in enumerate(train_loader):
            batch_np = (images, labels, mask)
            if opt.profile and epoch == start_epoch and i == 4:
                with trace(opt.profile):
                    state, metrics = run_single(batch_np)
                    jax.block_until_ready(metrics["total"])
                print(f"profiler trace written to {opt.profile}")
                continue
            if chained_step is None:
                with timer:
                    state, metrics = run_single(batch_np)
                log_progress(i, metrics)
                continue
            pending.append(batch_np)
            if len(pending) == chain_k:
                with timer:
                    state, metrics = run_chain(pending)
                pending = []
                log_progress(i, metrics)
        # leftover partial chain at epoch end runs step-by-step (exact
        # semantics: no padded/duplicated gradient steps)
        for batch_np in pending:
            with timer:
                state, metrics = run_single(batch_np)
        if pending:
            log_progress(spe - 1, metrics)
        ts = timer.summary()
        print("epoch %d took %.1fs (step p50 %.1f ms)"
              % (epoch, time.time() - t_epoch, ts.get("p50_ms", 0.0)))

        if epoch % opt.eval_every == 0 and epoch > 0:
            eval_vars = {"params": state.params,
                         "batch_stats": state.batch_stats}

            def batches():
                for im, lb, mk in DataLoader(val_ds, **val_loader_args):
                    yield jnp.asarray(im), lb, mk

            dist = jax.process_count() > 1
            # eval-grade precision for the AP-stamped saves: the detect
            # fns trace (and cache) under highest matmul precision, so
            # the stamped AP agrees with cli/evaluation.py on the same
            # weights (TPU default-bf16 MXU passes measurably shift
            # conf-0.01 metrics — docs/COCO_RUNBOOK.md); training steps
            # stay at default precision
            with jax.default_matmul_precision("highest"):
                print("computer mAP...")
                res_map = evaluate(detect_map, eval_vars, batches(),
                                   (cfg.height, cfg.width), progress=True,
                                   distributed=dist)
                print("computer PR...")
                res_pr = evaluate(detect_pr, eval_vars, batches(),
                                  (cfg.height, cfg.width), progress=True,
                                  distributed=dist)
            ap = res_map[2] if res_map else 0.0
            precision, recall, f1 = (res_pr[0], res_pr[1], res_pr[3]) \
                if res_pr else (0.0, 0.0, 0.0)
            print("Precision:%f Recall:%f AP:%f F1:%f"
                  % (precision, recall, ap, f1))

            # AP-stamped npz weights + orbax full-state checkpoint
            if primary:
                out = os.path.join(
                    opt.weights_dir,
                    "%s-%d-epoch-%fap-model.npz" % (cfg.model_name, epoch,
                                                    ap))
                _save_npz(eval_vars, out)
                print("saved", out)
            # step = number of COMPLETED epochs, so --resume continues
            # at epoch+1 instead of repeating this epoch
            save_checkpoint(opt.ckpt_dir, epoch + 1, jax.device_get(state))

    # final save
    save_checkpoint(opt.ckpt_dir, cfg.epochs, jax.device_get(state))
    if primary:
        _save_npz({"params": state.params,
                   "batch_stats": state.batch_stats},
                  os.path.join(opt.weights_dir,
                               "%s-final-model.npz" % cfg.model_name))


def _save_npz(variables, path):
    import jax
    flat = {}

    def rec(tree, prefix):
        for k, v in tree.items():
            if isinstance(v, dict):
                rec(v, prefix + (k,))
            else:
                flat["/".join(prefix + (k,))] = np.asarray(v)

    rec(jax.device_get(variables), ())
    np.savez(path, **flat)


if __name__ == "__main__":
    main()
