"""Benchmark: ERD (GFL-R50 teacher+student) train step throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note (see BASELINE.md): the reference publishes no train throughput.
The documented proxy is GFL R50-FPN 1x trained on 8x V100 with 2 img/GPU
(configs/gfl/README.md) — community-standard timing for this model family is
~0.22-0.25 s/iter per GPU at bs=2, i.e. ~8.7 img/s per GPU for PLAIN GFL;
the ERD stage runs teacher+student (~1.7x cost), so the reference ERD
per-chip estimate used here is 5.2 img/s. vs_baseline = ours / 5.2.
"""
import json
import sys
import time

import numpy as np

REF_ERD_IMG_PER_SEC_PER_CHIP = 5.2


def main():
    import jax
    import jax.numpy as jnp
    from erd_tpu.engine import sgd_optimizer, warmup_multistep
    from erd_tpu.models import ERDConfig, ERDDetector
    from __graft_entry__ import _make_batch

    # bs=16 > bs=8 since the round-2 fp32-promotion fix (ROUND2.md: 46.3
    # vs 44.4 img/s); bs=32 exceeds HBM on a single v5e chip
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    h, w = 800, 1344

    det = ERDDetector(num_classes=80, depth=50,
                      erd=ERDConfig(ori_num_classes=40, num_devices=1),
                      compute_dtype=jnp.bfloat16)
    teacher = det.teacher.init(jax.random.PRNGKey(1), image_shape=(h, w))
    student = det.init_student_from_teacher(jax.random.PRNGKey(2), teacher,
                                            image_shape=(h, w))

    tx = sgd_optimizer(warmup_multistep(0.01, 500), frozen_stages=1)
    params = student['params']
    consts = {k: v for k, v in student.items() if k != 'params'}
    opt_state = jax.jit(tx.init)(params)

    b = _make_batch(det, batch, h, w)

    from functools import partial

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch):
        def loss_fn(p):
            losses = det.loss({'params': p, **consts}, batch,
                              teacher_variables=teacher)
            return sum(jax.tree.leaves(losses)), losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, new_state = tx.update(grads, opt_state, params)
        return (jax.tree.map(lambda a, u: a + u, params, updates),
                new_state, losses)

    # warmup / compile
    params, opt_state, losses = train_step(params, opt_state, b)
    jax.block_until_ready(params)
    params, opt_state, losses = train_step(params, opt_state, b)
    jax.block_until_ready(params)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, losses = train_step(params, opt_state, b)
    jax.block_until_ready(params)
    dt = time.perf_counter() - t0

    img_per_sec = batch * iters / dt
    print(json.dumps({
        'metric': 'ERD GFL-R50 train images/sec/chip (bs=%d, 800x1344, bf16)'
                  % batch,
        'value': round(img_per_sec, 2),
        'unit': 'img/s',
        'vs_baseline': round(img_per_sec / REF_ERD_IMG_PER_SEC_PER_CHIP, 2),
    }))


if __name__ == '__main__':
    main()
