#!/usr/bin/env python
"""Capture a device trace of the fused ERD train step and print the top
HLO time consumers. Dev tool for perf work (uses the tsl xplane proto).

Usage: python tools/trace_step.py [batch] [outdir]
"""
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp


def capture(batch_size=8, outdir='/tmp/jaxtrace'):
    from erd_tpu.engine import sgd_optimizer, warmup_multistep
    from erd_tpu.models import ERDConfig, ERDDetector
    from __graft_entry__ import _make_batch

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

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            losses = det.loss({'params': p, **consts}, b,
                              teacher_variables=teacher)
            return sum(jax.tree.leaves(losses))

        g = jax.grad(loss_fn)(p)
        u, s2 = tx.update(g, s, p)
        return jax.tree.map(lambda a, x: a + x, p, u), s2

    params, opt_state = step(params, opt_state)
    jax.block_until_ready(params)
    with jax.profiler.trace(outdir):
        for _ in range(3):
            params, opt_state = step(params, opt_state)
        jax.block_until_ready(params)
    return outdir


def summarize(outdir, top=40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = sorted(glob.glob(os.path.join(outdir, '**', '*.xplane.pb'),
                             recursive=True))
    assert paths, f'no xplane.pb under {outdir}'
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], 'rb') as f:
        xspace.ParseFromString(f.read())

    totals = defaultdict(float)
    device_total = 0.0
    async_total = 0.0
    step_ms = []
    for plane in xspace.planes:
        if 'TPU' not in plane.name and 'device' not in plane.name.lower():
            continue
        for line in plane.lines:
            if line.name == 'Steps':
                step_ms = [ev.duration_ps / 1e9 for ev in line.events]
            # 'XLA Ops' is the SYNC compute timeline; 'Async XLA Ops'
            # carries DMA copy-start/done whose durations overlap compute
            # and must not be summed into serial time.
            lname = line.name.lower()
            if lname == 'async xla ops':
                async_total += sum(ev.duration_ps / 1e9
                                   for ev in line.events)
                continue
            # tolerant match: some toolchain versions label the op
            # timeline differently ('XLA Ops', 'xla op trace', ...)
            if 'xla op' not in lname:
                continue
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                dur_ms = ev.duration_ps / 1e9
                totals[meta.name] += dur_ms
                device_total += dur_ms
    if step_ms:
        print('steps traced: %d, mean %.1f ms/step' %
              (len(step_ms), sum(step_ms) / len(step_ms)))
    print(f'async DMA total (overlapped, not serial): {async_total:.1f} ms')
    rows = sorted(totals.items(), key=lambda kv: -kv[1])
    print(f'device op time total: {device_total:.1f} ms '
          f'({len(rows)} distinct ops)')

    # Category accounting: copy-start/copy-done are ASYNC DMA whose listed
    # duration spans until completion — they overlap compute and must not be
    # read as serial time. Convolutions lower to %custom-call (cuDNN-style
    # conv targets) or %convolution; those are the MXU time.
    def category(name):
        n = name.lstrip('%')
        if n.startswith(('copy-start', 'copy-done', 'copy.',
                         'all-reduce', 'collective')):
            return 'async-dma/copies (overlapped)'
        if 'custom-call' in name or n.startswith('convolution'):
            return 'conv custom-calls (MXU)'
        if n.startswith(('dot', 'cublas', 'gemm')) or 'dot_general' in name:
            return 'matmul (MXU)'
        if n.startswith('sort'):
            return 'sort'
        if n.startswith('while'):
            return 'while loops (NMS fixpoint etc.)'
        if n.startswith(('scatter', 'gather', 'dynamic-')):
            return 'scatter/gather'
        if n.startswith('fusion') or '_fusion' in n.split(' ')[0]:
            return 'elementwise/reduce fusions (VPU)'
        return 'other'

    cats = defaultdict(float)
    for name, ms in totals.items():
        cats[category(name)] += ms
    print('\n-- by category (NB: async copies overlap compute) --')
    for c, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f'{ms:9.2f} ms {100 * ms / device_total:5.1f}%  {c}')
    print('\n-- top ops --')
    for name, ms in rows[:top]:
        print(f'{ms:9.2f} ms {100 * ms / device_total:5.1f}%  {name[:120]}')


if __name__ == '__main__':
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/jaxtrace'
    summarize(capture(bs, out))
