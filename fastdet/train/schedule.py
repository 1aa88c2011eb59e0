"""LR schedule: quartic warmup + multi-step decay.

Closed-form equivalent of the reference's in-loop mutation
(/root/reference/train.py:88-90,112-117): for the first 5 epochs of
batches, lr = base·(step/warmup)⁴; afterwards the MultiStepLR value
base·0.1^(#milestone epochs passed).  Milestones (150, 250) are far past
the warmup window, so the two compose cleanly.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp


def make_lr_schedule(base_lr: float, steps_per_epoch: int,
                     milestones: Sequence[int], gamma: float = 0.1,
                     warmup_epochs: int = 5) -> Callable:
    warmup_steps = warmup_epochs * steps_per_epoch
    milestones = tuple(int(m) for m in milestones)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        epoch = jnp.floor(step / steps_per_epoch)
        decay = jnp.float32(1.0)
        for m in milestones:
            decay = decay * jnp.where(epoch >= m, gamma, 1.0)
        warm = jnp.clip(step / jnp.maximum(warmup_steps, 1), 0.0, 1.0) ** 4
        lr = base_lr * jnp.where(step <= warmup_steps, warm, 1.0) * decay
        return lr

    return schedule
