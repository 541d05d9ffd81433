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


# ---------------------------------------------------------------------------
# FSDP-style parameter sharding (ZeRO-3 analogue; beyond the reference's
# DDP — params/opt-state shard over the SAME data axis, GSPMD inserts the
# use-site all-gathers and grad reduce-scatters over ICI)
# ---------------------------------------------------------------------------
def fsdp_spec(x, n: int, axis_name: str = 'data',
              min_size: int = 1 << 14) -> P:
    """PartitionSpec sharding x's largest n-divisible axis; small or
    indivisible leaves stay replicated (their all-gather would cost more
    than the memory saved)."""
    if getattr(x, 'ndim', 0) == 0 or x.size < min_size:
        return P()
    dims = sorted(range(x.ndim), key=lambda d: -x.shape[d])
    for d in dims:
        if x.shape[d] % n == 0:
            return P(*([None] * d + [axis_name]))
    return P()


def shard_params_fsdp(tree, mesh: Mesh, axis_name: str = 'data',
                      min_size: int = 1 << 14):
    """device_put a param/opt-state pytree with per-leaf FSDP shardings."""
    n = mesh.shape[axis_name]

    def put(x):
        return jax.device_put(
            x, NamedSharding(mesh, fsdp_spec(x, n, axis_name, min_size)))

    return jax.tree.map(put, tree)
