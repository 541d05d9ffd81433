"""Train-time BatchNorm under SPMD data parallelism IS SyncBN.

The reference needs SyncNormHook/SyncBN because DDP replicas compute
per-process statistics. In the single-controller SPMD design the train
step is ONE XLA program over the global batch: nn.BatchNorm's mean/var
reductions span the full (sharded) batch axis and GSPMD inserts the
cross-device collectives automatically. This test pins that: batch stats
computed under an 8-device mesh equal the GLOBAL numpy statistics, not
any per-shard value.
"""
import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TinyBN(nn.Module):
    @nn.compact
    def __call__(self, x, train=True):
        return nn.BatchNorm(use_running_average=not train, momentum=0.0,
                            name='bn')(x)


def test_batchnorm_stats_are_global_across_mesh():
    devs = jax.devices()
    assert len(devs) == 8
    mesh = Mesh(np.asarray(devs), ('data',))
    rs = np.random.RandomState(0)
    # deliberately different distribution per shard: shard i has mean ~ i
    x = np.concatenate([rs.normal(i, 0.1, (2, 4, 4, 3)).astype(np.float32)
                        for i in range(8)])
    model = TinyBN()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:2]),
                           train=False)

    xs = jax.device_put(jnp.asarray(x),
                        NamedSharding(mesh, P('data', None, None, None)))

    @jax.jit
    def step(v, xb):
        _, new_state = model.apply(v, xb, train=True,
                                   mutable=['batch_stats'])
        return new_state['batch_stats']

    with mesh:
        stats = jax.device_put(step(variables, xs), devs[0])
    got_mean = np.asarray(stats['bn']['mean'])
    want_mean = x.mean(axis=(0, 1, 2))  # GLOBAL batch mean (~3.5)
    np.testing.assert_allclose(got_mean, want_mean, rtol=1e-3)
    # a per-shard mean would be ~0..7; global is ~3.5 — assert it is not
    # any single shard's statistics
    assert abs(got_mean.mean() - 3.5) < 0.1
