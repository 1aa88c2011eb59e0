"""Orbax checkpointing: params + batch stats + optimizer state + step.

A strict capability superset of the reference's bare `state_dict` saves
(/root/reference/train.py:143-144): we persist the full train state so
training can truly resume (the reference only supports finetune-style
partial reloads).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _mngr(ckpt_dir: str, max_to_keep: Optional[int] = None) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True),
    )


def save_checkpoint(ckpt_dir: str, step: int, state: Any,
                    max_to_keep: Optional[int] = None) -> None:
    """Save an arbitrary pytree (async under the hood; we wait for safety)."""
    mngr = _mngr(ckpt_dir, max_to_keep)
    mngr.save(step, args=ocp.args.StandardSave(state))
    mngr.wait_until_finished()
    mngr.close()


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    mngr = _mngr(ckpt_dir)
    step = mngr.latest_step()
    mngr.close()
    return step


def load_checkpoint(ckpt_dir: str, step: Optional[int] = None,
                    target: Any = None) -> Any:
    """Restore a pytree; `target` (if given) supplies structure/shardings."""
    mngr = _mngr(ckpt_dir)
    if step is None:
        step = mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {ckpt_dir}")
    if target is not None:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        restored = mngr.restore(step, args=ocp.args.StandardRestore(abstract))
    else:
        restored = mngr.restore(step)
    mngr.close()
    return restored
