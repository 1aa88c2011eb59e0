"""Multi-chip dry run: jit the FULL training step over an n-device mesh
and execute one step on tiny shapes (works on virtual CPU devices via
--xla_force_host_platform_device_count).

With >= 4 devices the mesh is 2-D (data, model): the batch shards over
the data axis and conv channel dimensions shard over the model axis
(tensor parallel, fastdet/parallel/tp.py) — both collective patterns
(gradient all-reduce over data, channel resharding over model) compile
and execute.  Below 4 devices it degrades to 1-D data parallel."""

from __future__ import annotations

import numpy as np


def run_dryrun(n_devices: int) -> None:
    import jax
    import jax.numpy as jnp

    from fastdet.config import Config
    from fastdet.models import Detector
    from fastdet.parallel.mesh import make_mesh, shard_batch
    from fastdet.parallel.tp import make_mesh_2d
    from fastdet.train.trainer import Trainer

    assert len(jax.devices()) >= n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())}")

    cfg = Config.from_dict({
        "classes": 8, "width": 64, "height": 64, "anchor_num": 3,
        "anchors": [4.0, 6.0, 9.0, 12.0, 16.0, 24.0,
                    24.0, 16.0, 32.0, 40.0, 52.0, 48.0],
        "learning_rate": 1e-3, "steps": [10, 20], "subdivisions": 1,
        "batch_size": 2 * n_devices, "epochs": 1,
    })
    if n_devices >= 4:
        n_model = 2
        mesh = make_mesh_2d(n_devices // n_model, n_model)
    else:
        mesh = make_mesh(n_devices)
    model = Detector(classes=cfg.classes, anchor_num=cfg.anchor_num)
    trainer = Trainer(model, cfg, steps_per_epoch=4, mesh=mesh)

    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, cfg.height, cfg.width, 3)),
                           train=False)
    state = trainer.init_state(variables)

    b, m = 2 * n_devices, 8
    rng = np.random.RandomState(0)
    images = rng.randint(0, 255, (b, cfg.height, cfg.width, 3), np.uint8)
    labels = np.zeros((b, m, 5), np.float32)
    labels[:, 0] = [1, 0.5, 0.5, 0.25, 0.25]
    labels[:, 1] = [3, 0.3, 0.7, 0.10, 0.15]
    mask = np.zeros((b, m), bool)
    mask[:, :2] = True

    batch = shard_batch(mesh, (jnp.asarray(images), jnp.asarray(labels),
                               jnp.asarray(mask)))
    state, metrics = trainer.step(state, *batch)
    state, metrics = trainer.step(state, *batch)
    total = float(metrics["total"])
    assert np.isfinite(total), f"non-finite loss {total}"
    desc = "x".join(f"{mesh.shape[a]}{a[0]}" for a in mesh.axis_names)
    print(f"dryrun_multichip({n_devices}): ok, mesh={desc}, "
          f"loss={total:.4f}, lr={float(metrics['lr']):.2e}")
