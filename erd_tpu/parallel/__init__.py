from .mesh import (batch_sharding, fsdp_spec, make_mesh, replicate,
                   replicated, shard_batch, shard_params_fsdp)

__all__ = ['make_mesh', 'batch_sharding', 'replicated', 'shard_batch',
           'replicate', 'fsdp_spec', 'shard_params_fsdp']
