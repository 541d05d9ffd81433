"""Device mesh + sharding helpers (the NCCL/DDP replacement).

The reference's only parallelism is data-parallel NCCL DDP
(tools/dist_train.sh, SURVEY.md section 2.10). Here the equivalent is a 1-D
``data`` mesh: batches shard on their leading axis, params/opt-state
replicate, and XLA inserts the gradient all-reduce over ICI because every
loss reduction spans the global (sharded) batch axis. No hand-written
collectives are needed — ``jnp.sum`` over a sharded axis IS the psum.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = 'data') -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = 'data') -> NamedSharding:
    """Shard the leading (batch) axis; works for any pytree leaf rank."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = 'data'):
    """device_put every leaf with its leading axis split over the mesh."""
    sh = batch_sharding(mesh, axis_name)

    def put(x):
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))
