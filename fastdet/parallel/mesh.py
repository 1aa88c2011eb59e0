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


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Multi-host init (jax.distributed), wired into every CLI.

    Arguments default to the FASTDET_COORDINATOR / FASTDET_NUM_PROCESSES
    / FASTDET_PROCESS_ID environment variables, so launching each host
    of a job is just:

        FASTDET_COORDINATOR=host0:1234 FASTDET_NUM_PROCESSES=2 \\
        FASTDET_PROCESS_ID=<i> python cli/train.py --data ...

    No-op (returns False) when no coordinator is configured — the
    single-process path pays nothing.  Must run before the first JAX
    computation of the process."""
    import os
    coordinator_address = (coordinator_address
                           or os.environ.get("FASTDET_COORDINATOR"))
    if coordinator_address is None:
        return False
    if num_processes is None:
        num_processes = int(os.environ["FASTDET_NUM_PROCESSES"])
    if process_id is None:
        process_id = int(os.environ["FASTDET_PROCESS_ID"])
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError:
        pass  # already initialized
    return True


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


def _put_sharded(tree: Any, s: NamedSharding) -> Any:
    """Place host batch leaves onto a (possibly multi-process) sharding.

    Single process: a plain device_put.  Multi-process: each host holds
    only ITS shard of the global batch (the loader's per-host strided
    slice), so the global array is assembled from process-local data —
    the global batch dimension is local_batch × process_count."""
    if jax.process_count() > 1:
        import numpy as np
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                s, np.asarray(x)), tree)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Place every leaf with its batch axis (0) sharded over the mesh."""
    return _put_sharded(tree, batch_sharding(mesh))


def shard_chained_batch(mesh: Mesh, tree: Any) -> Any:
    """Place (K, B, ...) stacked-chain leaves: the chain axis is
    replicated (lax.scan steps through it), the batch axis sharded."""
    return _put_sharded(tree, NamedSharding(mesh, P(None, DATA_AXIS)))
