"""Trainer, LR schedule, and multi-chip (fake 8-device mesh) tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastdet.train.schedule import make_lr_schedule


def test_lr_schedule_reference_semantics():
    """Quartic warmup over 5 epochs of batches, ×0.1 at each milestone
    epoch (reference train.py:88-90,112-117)."""
    spe = 10
    sched = make_lr_schedule(0.001, spe, milestones=(150, 250))
    warm = 5 * spe
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(warm // 2)), 0.001 * 0.5 ** 4,
                               rtol=1e-6)
    np.testing.assert_allclose(float(sched(warm)), 0.001, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100 * spe)), 0.001, rtol=1e-6)
    np.testing.assert_allclose(float(sched(150 * spe)), 0.0001, rtol=1e-6)
    np.testing.assert_allclose(float(sched(250 * spe)), 0.00001, rtol=1e-6)


def test_dryrun_multichip_8():
    """The driver's multi-chip validation path on the fake CPU mesh."""
    from fastdet.parallel.dryrun import run_dryrun
    assert len(jax.devices()) >= 8
    run_dryrun(8)


def test_train_loss_decreases():
    """A few steps of single-device training reduce the loss on a fixed
    tiny batch (end-to-end: model fwd, dense loss, SGD+momentum)."""
    from fastdet.config import Config
    from fastdet.models import Detector
    from fastdet.train.trainer import Trainer

    cfg = Config.from_dict({
        "classes": 4, "width": 64, "height": 64, "anchor_num": 3,
        "anchors": [4.0, 6.0, 9.0, 12.0, 16.0, 24.0,
                    24.0, 16.0, 32.0, 40.0, 52.0, 48.0],
        "learning_rate": 0.01, "steps": [1000], "subdivisions": 1,
        "batch_size": 4, "epochs": 1,
    })
    model = Detector(classes=cfg.classes, anchor_num=cfg.anchor_num)
    # steps_per_epoch tiny → warmup passes quickly
    trainer = Trainer(model, cfg, steps_per_epoch=1)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    state = trainer.init_state(variables)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 255, (4, 64, 64, 3), np.uint8))
    labels = np.zeros((4, 8, 5), np.float32)
    labels[:, 0] = [1, 0.5, 0.5, 0.3, 0.3]
    mask = np.zeros((4, 8), bool)
    mask[:, 0] = True
    labels, mask = jnp.asarray(labels), jnp.asarray(mask)

    losses = []
    for _ in range(12):
        state, metrics = trainer.step(state, images, labels, mask)
        losses.append(float(metrics["total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[1], losses


def test_grad_accumulation_matches_large_batch():
    """subdivisions=2 on half-batches equals subdivisions=1 on the full
    batch after the optimizer applies (summed-gradient semantics ×
    identical lr schedule) — up to BN batch-stat differences, so we use
    eval-mode-free comparison on the params delta direction."""
    from fastdet.config import Config
    from fastdet.models import Detector
    from fastdet.train.trainer import Trainer

    base = {
        "classes": 2, "width": 32, "height": 32, "anchor_num": 3,
        "anchors": [4.0, 6.0, 9.0, 12.0, 16.0, 24.0,
                    24.0, 16.0, 32.0, 40.0, 52.0, 48.0],
        "learning_rate": 0.01, "steps": [1000], "epochs": 1,
        "batch_size": 4,
    }
    model = Detector(classes=2, anchor_num=3)
    variables = model.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, 32, 32, 3)), train=False)

    rng = np.random.RandomState(1)
    images = rng.randint(0, 255, (4, 32, 32, 3), np.uint8)
    labels = np.zeros((4, 4, 5), np.float32)
    labels[:, 0] = [0, 0.5, 0.5, 0.4, 0.4]
    mask = np.zeros((4, 4), bool)
    mask[:, 0] = True

    cfg2 = Config.from_dict(dict(base, subdivisions=2))
    tr2 = Trainer(model, cfg2, steps_per_epoch=1)
    s2 = tr2.init_state(jax.tree.map(jnp.copy, variables))
    s2, _ = tr2.step(s2, jnp.asarray(images[:2]),
                     jnp.asarray(labels[:2]), jnp.asarray(mask[:2]))
    # params must be unchanged before the accumulation boundary
    d0 = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        s2.params, variables["params"]))
    assert max(d0) == 0.0
    s2, _ = tr2.step(s2, jnp.asarray(images[2:]),
                     jnp.asarray(labels[2:]), jnp.asarray(mask[2:]))
    d1 = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        s2.params, variables["params"]))
    assert max(d1) > 0.0


def test_utils_profiling_and_logging(tmp_path):
    """Model summary table, step timer, metrics JSONL."""
    import json
    from fastdet.models import Detector
    from fastdet.utils import MetricsLogger, StepTimer, summarize_model

    model = Detector(classes=4, anchor_num=3)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    table = summarize_model(model, variables, (1, 64, 64, 3))
    assert "Trainable params" in table and "backbone" in table

    t = StepTimer(warmup=1)
    for _ in range(4):
        with t:
            pass
    s = t.summary()
    assert s["steps"] == 3 and "p50_ms" in s

    log = MetricsLogger(str(tmp_path), "t")
    log.log(1, {"total": 1.5, "lr": 0.001})
    log.log(2, {"total": 1.2, "lr": 0.001}, kind="eval")
    log.close()
    recs = [json.loads(l) for l in open(log.path)]
    assert len(recs) == 2 and recs[0]["total"] == 1.5
    assert recs[1]["kind"] == "eval"


def test_metrics_logger_tensorboard(tmp_path):
    """`tensorboard=True` mirrors float scalars to event files
    (SURVEY.md §5: optional TensorBoard writer on top of JSONL)."""
    import os
    from fastdet.utils import MetricsLogger

    log = MetricsLogger(str(tmp_path), "t", tensorboard=True)
    log.log(1, {"total": 1.5, "lr": 0.001})
    log.log(5, {"mAP": 0.2}, kind="eval")
    log.close()
    tb_dir = tmp_path / "t_tb"
    if not tb_dir.exists():
        pytest.skip("no tensorboard backend available")
    events = [f for f in os.listdir(tb_dir) if "tfevents" in f]
    assert events, "no TensorBoard event file written"
    assert os.path.getsize(tb_dir / events[0]) > 0


def test_checkpoint_roundtrip(tmp_path):
    """Orbax save/restore of the full train state (true resume — a
    capability the reference lacks, SURVEY.md §5)."""
    from fastdet.config import Config
    from fastdet.io import load_checkpoint, latest_step, save_checkpoint
    from fastdet.models import Detector
    from fastdet.train.trainer import Trainer

    cfg = Config.from_dict({
        "classes": 2, "width": 32, "height": 32, "anchor_num": 3,
        "anchors": [4.0, 6.0, 9.0, 12.0, 16.0, 24.0,
                    24.0, 16.0, 32.0, 40.0, 52.0, 48.0],
        "learning_rate": 0.01, "steps": [100], "subdivisions": 1,
        "batch_size": 2, "epochs": 1})
    model = Detector(classes=2, anchor_num=3)
    trainer = Trainer(model, cfg, steps_per_epoch=1)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    state = trainer.init_state(variables)

    images = jnp.zeros((2, 32, 32, 3), jnp.uint8)
    labels = jnp.zeros((2, 4, 5))
    mask = jnp.zeros((2, 4), bool)
    state, _ = trainer.step(state, images, labels, mask)

    ckpt = str(tmp_path / "ck")
    save_checkpoint(ckpt, 7, jax.device_get(state))
    assert latest_step(ckpt) == 7
    restored = load_checkpoint(ckpt, target=state)
    assert int(restored.step) == int(state.step)
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multihost_helpers_single_process():
    """process_shard and gather_eval_stats degenerate correctly on one
    process (multi-process gather exercises the same packing)."""
    from fastdet.parallel.multihost import gather_eval_stats, process_shard
    s, e = process_shard(10)
    assert (s, e) == (0, 10)
    stats = [(np.ones(3), np.linspace(1, 0, 3), np.zeros(3)),
             (np.zeros(0), np.zeros(0), np.zeros(0))]
    labels = [1.0, 2.0]
    gs, gl = gather_eval_stats(stats, labels)
    assert len(gs) == 2 and gl == labels
    np.testing.assert_array_equal(gs[0][0], stats[0][0])


def test_chained_train_steps():
    """K steps in one program == K sequential steps (same final params)."""
    from fastdet.config import Config
    from fastdet.models import Detector
    from fastdet.train.trainer import Trainer

    cfg = Config.from_dict({
        "classes": 2, "width": 32, "height": 32, "anchor_num": 3,
        "anchors": [4.0, 6.0, 9.0, 12.0, 16.0, 24.0,
                    24.0, 16.0, 32.0, 40.0, 52.0, 48.0],
        "learning_rate": 0.01, "steps": [100], "subdivisions": 1,
        "batch_size": 2, "epochs": 1})
    model = Detector(classes=2, anchor_num=3)
    trainer = Trainer(model, cfg, steps_per_epoch=1)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)

    # K=2: warmup makes step 0's lr exactly 0, so only one optimizer
    # apply has effect — the comparison is then exact (longer chains
    # diverge at fp32-reassociation level once training chaos kicks in)
    rng = np.random.RandomState(0)
    K, B = 2, 2
    imgs = rng.randint(0, 255, (K, B, 32, 32, 3), np.uint8)
    labels = np.zeros((K, B, 4, 5), np.float32)
    labels[..., 0, :] = [1, 0.5, 0.5, 0.4, 0.4]
    mask = np.zeros((K, B, 4), bool)
    mask[..., 0] = True

    s_seq = trainer.init_state(jax.tree.map(jnp.copy, variables))
    for i in range(K):
        s_seq, m_seq = trainer.step(s_seq, jnp.asarray(imgs[i]),
                                    jnp.asarray(labels[i]),
                                    jnp.asarray(mask[i]))

    chained = trainer.make_chained_step(K)
    s_ch, m_ch = chained(trainer.init_state(jax.tree.map(jnp.copy, variables)),
                         jnp.asarray(imgs), jnp.asarray(labels),
                         jnp.asarray(mask))

    assert int(s_ch.step) == int(s_seq.step) == K
    for a, b in zip(jax.tree.leaves(s_seq.params),
                    jax.tree.leaves(s_ch.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    assert m_ch["total"].shape == (K,)
    np.testing.assert_allclose(float(m_ch["total"][-1]),
                               float(m_seq["total"]), rtol=1e-4)


def test_tensor_parallel_matches_single_device():
    """Training on a 2-D (data, model) mesh — batch sharded over data,
    conv channel dims sharded over model (fastdet/parallel/tp.py) —
    produces the same params as unsharded single-device training:
    tensor-parallel sharding is a layout choice, GSPMD inserts the
    collectives (SURVEY.md §5 comm-backend requirement, TP axis)."""
    from fastdet.config import Config
    from fastdet.models import Detector
    from fastdet.parallel.mesh import shard_batch
    from fastdet.parallel.tp import MODEL_AXIS, make_mesh_2d
    from fastdet.train.trainer import Trainer

    cfg = Config.from_dict({
        "classes": 4, "width": 32, "height": 32, "anchor_num": 3,
        "anchors": [4.0, 6.0, 9.0, 12.0, 16.0, 24.0,
                    24.0, 16.0, 32.0, 40.0, 52.0, 48.0],
        "learning_rate": 0.01, "steps": [1000], "subdivisions": 1,
        "batch_size": 8, "epochs": 1})
    model = Detector(classes=4, anchor_num=3)
    variables = model.init(jax.random.PRNGKey(2),
                           jnp.zeros((1, 32, 32, 3)), train=False)

    rng = np.random.RandomState(3)
    images = rng.randint(0, 255, (2, 8, 32, 32, 3), np.uint8)
    labels = np.zeros((2, 8, 4, 5), np.float32)
    labels[..., 0, :] = [1, 0.5, 0.5, 0.5, 0.5]
    mask = np.zeros((2, 8, 4), bool)
    mask[..., 0] = True

    tr1 = Trainer(model, cfg, steps_per_epoch=2)
    s1 = tr1.init_state(jax.tree.map(jnp.copy, variables))
    for i in range(2):
        s1, m1 = tr1.step(s1, jnp.asarray(images[i]),
                          jnp.asarray(labels[i]), jnp.asarray(mask[i]))

    mesh = make_mesh_2d(4, 2)
    tr2 = Trainer(model, cfg, steps_per_epoch=2, mesh=mesh)
    s2 = tr2.init_state(jax.tree.map(jnp.copy, variables))
    # channel dims must actually shard over the model axis
    k = s2.params["backbone"]["first_conv"]["conv"]["kernel"]
    assert MODEL_AXIS in str(k.sharding.spec), k.sharding
    for i in range(2):
        batch = shard_batch(mesh, (jnp.asarray(images[i]),
                                   jnp.asarray(labels[i]),
                                   jnp.asarray(mask[i])))
        s2, m2 = tr2.step(s2, *batch)

    assert np.allclose(float(m1["total"]), float(m2["total"]),
                       rtol=1e-4), (m1, m2)
    # cross-device reductions reassociate floats (~1e-7/step), and the
    # noise amplifies through discrete thresholds (ReLU flips, anchor
    # match ratios) over the 2 steps — isolated elements reach ~4e-5
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-4)


def test_bf16_dtype_reaches_convs():
    """Regression: the model's own dtype must drive conv/BN compute —
    round 2 found --bf16 silently promoted back to f32 because only the
    input was cast (cli/train.py builds the family with dtype=bf16)."""
    from fastdet.config import Config
    from fastdet.models.registry import get_family
    cfg = Config.from_dict({
        "classes": 3, "width": 64, "height": 64, "anchor_num": 3,
        "anchors": [10, 10, 20, 20, 30, 30, 40, 40, 50, 50, 60, 60]})
    for name in ("yolo-fastestv2", "anchorfree"):
        fam = get_family(name, cfg, dtype=jnp.bfloat16)
        x = jnp.zeros((1, 64, 64, 3), jnp.uint8).astype(jnp.bfloat16)
        variables = fam.model.init(jax.random.PRNGKey(0), x, train=False)
        outs = fam.model.apply(variables, x, train=False)
        outs = outs if isinstance(outs, (tuple, list)) else [outs]
        # raw head outputs carry the compute dtype; f32 would mean the
        # model promoted internally
        assert all(o.dtype == jnp.bfloat16 for o in outs), \
            [o.dtype for o in outs]
        # params stay fp32 regardless of compute dtype
        leaves = jax.tree.leaves(variables["params"])
        assert all(p.dtype == jnp.float32 for p in leaves)
