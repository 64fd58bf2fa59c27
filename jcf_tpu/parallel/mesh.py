"""Device mesh + sharding helpers (SURVEY.md §2.5).

The reference is single-GPU; the TPU-native scale-out story is data
parallelism over the TTA crop/image batch and the training batch:

- a 1-D ``Mesh`` over all local (or all global) devices, axis "data"
- batches sharded on dim 0 with ``NamedSharding``; parameters replicated
  (ViT-B/32 is ~150M params — fits per chip, SURVEY.md §2.5)
- under ``jax.jit`` XLA inserts the all-reduces over ICI; across hosts,
  ``jax.distributed.initialize`` extends the same program over DCN

Tensor-parallel layouts remain available by adding a "model" axis to the
mesh and sharding weight matrices; the workload doesn't need it at this
model scale, so the default mesh keeps model=1.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init over DCN (no-op for single-process runs)."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    n_devices: Optional[int] = None,
    axis: str = "data",
    devices: Optional[Sequence] = None,
) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard dim 0 over the mesh axis; replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """device_put a pytree with dim-0 batch sharding on every array leaf."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, getattr(x, "ndim", 0) or 1, axis)),
        tree,
    )


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated_sharding(mesh)), tree
    )
