#!/usr/bin/env python
"""Decompose ERD train-step time on the real chip: full step vs no-distill
vs distill-without-NMS, and batch scaling. Dev tool for perf work."""
import json
import sys
import time
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from erd_tpu.engine import sgd_optimizer, warmup_multistep
    from erd_tpu.models import ERDConfig, ERDDetector
    from __graft_entry__ import _make_batch

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    h, w = 800, 1344
    det = ERDDetector(num_classes=80, depth=50,
                      erd=ERDConfig(ori_num_classes=40),
                      compute_dtype=jnp.bfloat16)
    teacher = det.teacher.init(jax.random.PRNGKey(1), image_shape=(h, w))
    student = det.init_student_from_teacher(jax.random.PRNGKey(2), teacher,
                                            image_shape=(h, w))
    tx = sgd_optimizer(warmup_multistep(0.01, 500), frozen_stages=1)
    params = student['params']
    consts = {k: v for k, v in student.items() if k != 'params'}
    opt_state = jax.jit(tx.init)(params)
    b = _make_batch(det, batch_size, h, w)

    def make_step(loss_kind):
        def loss_fn(p):
            variables = {'params': p, **consts}
            if loss_kind == 'full':
                losses = det.loss(variables, b, teacher_variables=teacher)
            elif loss_kind == 'nodistill':
                # supervised slice only (plain GFL on new classes)
                from erd_tpu.models.heads.gfl_head import (flatten_levels,
                                                           gfl_loss,
                                                           gfl_targets)
                ctx = det.anchor_context(b['images'].shape[1:3])
                cls_lvl, reg_lvl = det.forward_raw(variables, b['images'])
                s_cls = flatten_levels(cls_lvl).astype(jnp.float32)
                s_reg = flatten_levels(reg_lvl).astype(jnp.float32)
                t = gfl_targets(ctx, b['gt'], b['meta'].img_shape, 40)
                losses = gfl_loss(ctx, s_cls[..., 40:], s_reg, t,
                                  det.train_cfg)
            return sum(jax.tree.leaves(losses))

        @jax.jit
        def step(p, s):
            g = jax.grad(loss_fn)(p)
            u, s2 = tx.update(g, s, p)
            return jax.tree.map(lambda a, x: a + x, p, u), s2

        return step

    report = {}
    for kind in ['nodistill', 'full']:
        step = make_step(kind)
        dt = timed(lambda: step(params, opt_state))
        report[kind + '_ms'] = round(dt * 1000, 1)
        report[kind + '_img_s'] = round(batch_size / dt, 1)
    # fwd-only teacher cost
    fwd = jax.jit(lambda: det.teacher.forward_raw(teacher, b['images']))
    report['teacher_fwd_ms'] = round(timed(fwd) * 1000, 1)
    pred = jax.jit(lambda: det.predict({'params': params, **consts}, b))
    report['predict_ms'] = round(timed(pred) * 1000, 1)
    print(json.dumps(report))


if __name__ == '__main__':
    main()
