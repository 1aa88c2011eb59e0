"""Multi-chip dry run: jit the FULL data-parallel training step over an
n-device mesh and execute one step on tiny shapes (works on virtual CPU
devices via --xla_force_host_platform_device_count)."""

from __future__ import annotations

import numpy as np


def run_dryrun(n_devices: int) -> None:
    import jax
    import jax.numpy as jnp

    from fastdet.config import Config
    from fastdet.models import Detector
    from fastdet.parallel.mesh import make_mesh, shard_batch
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
    print(f"dryrun_multichip({n_devices}): ok, loss={total:.4f}, "
          f"lr={float(metrics['lr']):.2e}")
