"""Device mesh + sharding helpers (the reference has no distributed layer;
this is the TPU-native scaling component: data-parallel batch sharding
over ICI with compiler-inserted all-reduce — SURVEY.md §5).

Design: a 1-D `data` mesh.  Parameters and optimizer state are
replicated; the image/label batch is sharded along axis 0.  Inside a
sharded `jit`, BatchNorm's batch-mean reductions become global
(cross-device) reductions automatically, so DP training computes
synchronized batch statistics without explicit collectives.  Multi-host
entry goes through `initialize_distributed()`.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed(**kwargs) -> None:
    """Multi-host init (jax.distributed); no-op if already initialized."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # single-process or already initialized


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence[Any]] = None) -> Mesh:
    """1-D data-parallel mesh over the first `n_devices` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard along axis 0 (the batch)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """device_put every leaf with its batch axis sharded over the mesh."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def shard_chained_batch(mesh: Mesh, tree: Any) -> Any:
    """device_put (K, B, ...) stacked-chain leaves: the chain axis is
    replicated (lax.scan steps through it), the batch axis sharded."""
    s = NamedSharding(mesh, P(None, DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
