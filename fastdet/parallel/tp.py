"""Tensor-parallel parameter sharding over a 2-D (data, model) mesh.

The reference has no distributed layer at all (SURVEY.md §2); data
parallelism is the natural scaling axis for this 0.25 M-param CNN, but
the framework also supports sharding the channel dimension of its convs
over a second mesh axis — the TPU-native tensor-parallel idiom: annotate
parameter shardings, let GSPMD insert the collectives over ICI.

Rules (shape-driven, so conv + its BatchNorm shard consistently):
  * conv kernels (kh, kw, cin, cout): shard `cout` over "model" when it
    divides the axis size (depthwise kernels are (kh, kw, 1, C) and
    shard their group dim the same way);
  * 1-D channel vectors (bias, BN scale/bias/mean/var): shard when
    divisible;
  * everything else (odd channel counts like the 3-unit obj head)
    replicates.

Numerical invariance: sharding only changes layout — a (data×model)
run must produce the same params as 1-D data-parallel (pinned in
tests/test_trainer.py).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh_2d(n_data: int, n_model: int,
                 devices: Optional[Any] = None) -> Mesh:
    """(data, model) mesh over the first n_data·n_model devices."""
    if devices is None:
        devices = jax.devices()
    n = n_data * n_model
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def _leaf_spec(leaf, n_model: int) -> P:
    shape = getattr(leaf, "shape", ())
    if len(shape) == 4 and shape[-1] % n_model == 0:
        return P(None, None, None, MODEL_AXIS)       # conv kernel cout
    if len(shape) == 2 and shape[-1] % n_model == 0:
        return P(None, MODEL_AXIS)                   # dense kernel cout
    if len(shape) == 1 and shape[0] % n_model == 0:
        return P(MODEL_AXIS)                         # bias / BN vectors
    return P()


def state_shardings(state: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for a TrainState (or any param pytree) on a
    (data, model) mesh; on a 1-D data mesh everything replicates."""
    if MODEL_AXIS not in mesh.axis_names:
        repl = NamedSharding(mesh, P())
        return jax.tree.map(lambda _: repl, state)
    n_model = mesh.shape[MODEL_AXIS]
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, _leaf_spec(leaf, n_model)), state)


def shard_state(state: Any, mesh: Mesh) -> Any:
    """device_put a TrainState with model-sharded channels."""
    return jax.tree.map(jax.device_put, state, state_shardings(state, mesh))
