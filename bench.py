"""Benchmark: ERD (GFL-R50 teacher+student) train step throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note (see BASELINE.md): the reference publishes no train throughput.
The documented proxy is GFL R50-FPN 1x trained on 8x V100 with 2 img/GPU
(configs/gfl/README.md) — community-standard timing for this model family is
~0.22-0.25 s/iter per GPU at bs=2, i.e. ~8.7 img/s per GPU for PLAIN GFL;
the ERD stage runs teacher+student (~1.7x cost), so the reference ERD
per-chip estimate used here is 5.2 img/s. vs_baseline = ours / 5.2.

Fail-soft (round 4): the round-3 driver capture died with rc=1 at TPU
backend init ("Unable to initialize backend 'axon'") with no diagnostics in
the output. Backend bring-up is now probed in a SUBPROCESS with a timeout
(an in-process hang is uninterruptible), retried with backoff, and on
persistent failure we still print the ONE JSON line — with value 0,
an "error" field, and enough diagnostics to tell "TPU down" apart from
"our step broke" at a glance.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

REF_ERD_IMG_PER_SEC_PER_CHIP = 5.2

PROBE = 'import jax; print("DEVICES", [str(d) for d in jax.devices()])'


def probe_backend(attempts=3, timeout_s=180):
    """Try to initialize the jax backend in a subprocess with a timeout.

    Returns (ok: bool, diagnostics: dict). An in-process
    ``jax.devices()`` call that hangs cannot be recovered from (the round-3
    failure mode), so each attempt is an isolated child process.
    """
    diags = {'attempts': [], 'platform_env': os.environ.get('JAX_PLATFORMS',
                                                            '<unset>')}
    for i in range(attempts):
        t0 = time.time()
        try:
            out = subprocess.run(
                [sys.executable, '-c', PROBE], capture_output=True,
                text=True, timeout=timeout_s)
            dt = round(time.time() - t0, 1)
            if out.returncode == 0 and 'DEVICES' in out.stdout:
                diags['attempts'].append(
                    {'n': i, 'ok': True, 'secs': dt,
                     'devices': out.stdout.strip()[:200]})
                return True, diags
            diags['attempts'].append(
                {'n': i, 'ok': False, 'secs': dt, 'rc': out.returncode,
                 'stderr_tail': out.stderr.strip()[-500:]})
        except subprocess.TimeoutExpired:
            diags['attempts'].append(
                {'n': i, 'ok': False, 'secs': timeout_s,
                 'stderr_tail': 'TIMEOUT: backend init hung > %ds'
                                % timeout_s})
        if i + 1 < attempts:
            time.sleep(10 * (i + 1))  # backoff before retry
    return False, diags


def fail_soft(reason, diags, batch):
    print(json.dumps({
        'metric': 'ERD GFL-R50 train images/sec/chip (bs=%d, 800x1344, '
                  'bf16)' % batch,
        'value': 0.0,
        'unit': 'img/s',
        'vs_baseline': 0.0,
        'error': reason,
        'diagnostics': diags,
    }))
    sys.exit(1)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    skip_probe = os.environ.get('ERD_BENCH_SKIP_PROBE') == '1'

    if not skip_probe:
        ok, diags = probe_backend()
        if not ok:
            fail_soft('TPU backend failed to initialize (env/tunnel outage, '
                      'not a model bug: the probe never reaches erd_tpu '
                      'code)', diags, batch)

    try:
        import jax
        import jax.numpy as jnp
        from erd_tpu.engine import sgd_optimizer, warmup_multistep
        from erd_tpu.models import ERDConfig, ERDDetector
        from __graft_entry__ import _make_batch

        # bs=16 > bs=8 since the round-2 fp32-promotion fix (ROUND2.md: 46.3
        # vs 44.4 img/s); bs=32 exceeds HBM on a single v5e chip
        h, w = 800, 1344

        det = ERDDetector(num_classes=80, depth=50,
                          erd=ERDConfig(ori_num_classes=40, num_devices=1),
                          compute_dtype=jnp.bfloat16)
        teacher = det.teacher.init(jax.random.PRNGKey(1), image_shape=(h, w))
        student = det.init_student_from_teacher(
            jax.random.PRNGKey(2), teacher, image_shape=(h, w))

        tx = sgd_optimizer(warmup_multistep(0.01, 500), frozen_stages=1)
        # copy before donating: init_student_from_teacher shares buffers
        # with the teacher tree, and the first (donating) step call would
        # delete them out from under the second jit's trace-time constants
        params = jax.tree.map(jnp.copy, student['params'])
        consts = {k: v for k, v in student.items() if k != 'params'}
        opt_state = jax.jit(tx.init)(params)

        b = _make_batch(det, batch, h, w)

        from functools import partial

        # The shipped trainer (engine/train_loop.py, loss_sampling
        # 'sampled') runs a grad-only step on 49 of every 50 iterations
        # (XLA DCEs the primal loss reductions backward doesn't need;
        # measured +15.7% on this step) and the loss-materializing step on
        # log/NaN-check iterations. The benchmark reproduces that 49:1 mix
        # and reports the amortized throughput.
        def make_step(with_losses):
            @partial(jax.jit, donate_argnums=(0, 1))
            def train_step(params, opt_state, batch):
                def loss_fn(p):
                    losses = det.loss({'params': p, **consts}, batch,
                                      teacher_variables=teacher)
                    return (sum(jax.tree.leaves(losses)),
                            losses if with_losses else {})

                grads, losses = jax.grad(loss_fn, has_aux=True)(params)
                updates, new_state = tx.update(grads, opt_state, params)
                return (jax.tree.map(lambda a, u: a + u, params, updates),
                        new_state, losses)
            return train_step

        light_step, aux_step = make_step(False), make_step(True)

        def time_step(step_fn, params, opt_state, iters):
            for _ in range(2):  # compile + warm
                params, opt_state, losses = step_fn(params, opt_state, b)
            jax.block_until_ready(params)
            t0 = time.perf_counter()
            for _ in range(iters):
                params, opt_state, losses = step_fn(params, opt_state, b)
            jax.block_until_ready(params)
            return (time.perf_counter() - t0) / iters, params, opt_state

        light_t, params, opt_state = time_step(light_step, params,
                                               opt_state, 10)
        aux_t, params, opt_state = time_step(aux_step, params,
                                             opt_state, 4)
        # amortized trainer step time at the default log_interval=50
        dt_amortized = (49 * light_t + aux_t) / 50
    except Exception as e:  # noqa: BLE001 - must still emit the JSON line
        import traceback
        fail_soft('bench step failed AFTER backend init — this IS '
                  'attributable to the repo: %s' % e,
                  {'traceback': traceback.format_exc()[-1500:]}, batch)
        return

    img_per_sec = batch / dt_amortized
    print(json.dumps({
        'metric': 'ERD GFL-R50 train images/sec/chip (bs=%d, 800x1344, bf16)'
                  % batch,
        'value': round(img_per_sec, 2),
        'unit': 'img/s',
        'vs_baseline': round(img_per_sec / REF_ERD_IMG_PER_SEC_PER_CHIP, 2),
        'detail': {'grad_only_img_s': round(batch / light_t, 2),
                   'loss_materializing_img_s': round(batch / aux_t, 2),
                   'mix': '49:1 (trainer loss_sampling=sampled, '
                          'log_interval=50)'},
    }))


if __name__ == '__main__':
    main()
