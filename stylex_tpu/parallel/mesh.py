"""Device mesh + sharding layout — the TPU replacement for the reference's
NCCL/DDP stack (SURVEY §2.10, §5.8).

The reference scaffolds one-process-per-GPU data parallelism
(`/root/reference/stylex/cli.py:43-53,241-250`,
`stylex_train.py:1188-1193,1226-1231`) and declares it broken. Here
parallelism is single-controller SPMD:

* one 1-D ``Mesh`` axis ``'data'`` over all chips (ICI-connected on a pod
  slice); training batches shard along their batch dimension, parameters are
  replicated, and XLA inserts the gradient all-reduce — the DDP wrapper,
  ``no_sync`` accumulation dance and ``DistributedSampler`` have no
  equivalents because the compiler owns communication,
* AttFind's long axis is the (image x sindex x direction) perturbation grid
  (SURVEY §5.7): :func:`coordinate_sharding` shards the flattened
  perturbation batch the same way, so a 2464-coordinate sweep fans out
  across the slice with zero cross-chip traffic until the final gather.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch", "coordinate_sharding"]


def make_mesh(num_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """A 1-D data-parallel mesh over the first ``num_devices`` devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis,))


def data_sharding(mesh: Mesh, batch_axis: int = 0, ndim: int = 4, axis: str = "data") -> NamedSharding:
    """Shard dimension ``batch_axis`` of an ``ndim``-rank array over the mesh."""
    spec = [None] * ndim
    spec[batch_axis] = axis
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, batch_axis: int = 1):
    """Place a pytree of stacked micro-batches ((accum, B, ...) arrays) with
    the global batch dimension sharded over the 'data' axis."""

    def put(x):
        x = jax.numpy.asarray(x)
        return jax.device_put(x, data_sharding(mesh, batch_axis, x.ndim))

    return jax.tree.map(put, tree)


def coordinate_sharding(mesh: Mesh, ndim: int = 2, axis: str = "data") -> NamedSharding:
    """Shard AttFind's flattened perturbation axis (dim 0) over the mesh."""
    spec = [None] * ndim
    spec[0] = axis
    return NamedSharding(mesh, P(*spec))
