#!/usr/bin/env python
"""A/B the ERS reg-branch candidate cap on the real chip.

VERDICT round-4 weak #2: the driver-verified throughput dropped 43.71 ->
41.94 img/s between rounds 2 and 4, almost certainly the price of the
exact-ERS change (`ers_reg_cap` 1000 -> auto-exact N//5+1 = 4481, which
quadrupled the distill-NMS candidate set). This tool attributes it: same
seed, same batch, same step as bench.py, one JSON line per variant.

Variants:
  exact        ers_reg_cap=0  -> N//5+1 (Chebyshev-exact, shipped default)
  capped1000   ers_reg_cap=1000 (round-3 behavior; truncates when >1000
               anchors clear mu+2sigma)
plus any extra integer caps passed on the CLI.

Usage: python tools/bench_ers_ab.py [batch] [cap1 cap2 ...]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def time_variant(cap, batch, h=800, w=1344, iters=10):
    import jax
    import jax.numpy as jnp
    from functools import partial
    from erd_tpu.engine import sgd_optimizer, warmup_multistep
    from erd_tpu.models import ERDConfig, ERDDetector
    from __graft_entry__ import _make_batch

    det = ERDDetector(num_classes=80, depth=50,
                      erd=ERDConfig(ori_num_classes=40, ers_reg_cap=cap,
                                    num_devices=1),
                      compute_dtype=jnp.bfloat16)
    teacher = det.teacher.init(jax.random.PRNGKey(1), image_shape=(h, w))
    student = det.init_student_from_teacher(jax.random.PRNGKey(2), teacher,
                                            image_shape=(h, w))
    tx = sgd_optimizer(warmup_multistep(0.01, 500), frozen_stages=1)
    params = student['params']
    consts = {k: v for k, v in student.items() if k != 'params'}
    opt_state = jax.jit(tx.init)(params)
    b = _make_batch(det, batch, h, w)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch):
        def loss_fn(p):
            losses = det.loss({'params': p, **consts}, batch,
                              teacher_variables=teacher)
            return sum(jax.tree.leaves(losses))

        grads = jax.grad(loss_fn)(params)
        updates, new_state = tx.update(grads, opt_state, params)
        return jax.tree.map(lambda a, u: a + u, params, updates), new_state

    for _ in range(2):  # compile + warm
        params, opt_state = train_step(params, opt_state, b)
    jax.block_until_ready(params)
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state = train_step(params, opt_state, b)
    jax.block_until_ready(params)
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    caps = [int(a) for a in sys.argv[2:]] or [0, 1000]
    for cap in caps:
        fps = time_variant(cap, batch)
        print(json.dumps({
            'variant': 'exact_auto(N//5+1)' if cap == 0 else f'capped{cap}',
            'ers_reg_cap': cap,
            'img_per_sec_per_chip': round(fps, 2),
            'batch': batch,
        }), flush=True)


if __name__ == '__main__':
    main()
