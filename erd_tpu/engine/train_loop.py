"""Training / evaluation loops: the mmengine Runner replacement.

Single-controller SPMD: one python process drives a jitted, donated train
step whose batch is sharded over the ``data`` mesh axis and whose params are
replicated — the gradient all-reduce, the ``avg_factor`` normalizer reduction
(reference reduce_mean, mmdet/utils/dist_utils.py:59-65) and the loss psum
all fall out of XLA's partitioning of global-batch reductions; there is no
explicit NCCL-style collective anywhere.
"""
from __future__ import annotations

import dataclasses
import logging
import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import (make_mesh, replicate, shard_batch,
                             shard_params_fsdp)
from .checkpoints import latest_checkpoint, load_checkpoint, save_checkpoint
from .hooks import CheckInvalidLossHook, Hook, LoggerHook
from .optim import sgd_optimizer
from .schedules import auto_scale_lr, warmup_multistep

log = logging.getLogger('erd_tpu')


@dataclass
class TrainerConfig:
    epochs: int = 12
    base_lr: float = 0.01
    momentum: float = 0.9
    weight_decay: float = 1e-4
    warmup_iters: int = 500
    warmup_epochs: int = 0  # >0 overrides warmup_iters (epoch-based)
    warmup_factor: float = 0.001
    milestones_epochs: tuple = (8, 11)
    gamma: float = 0.1
    schedule: str = 'multistep'  # 'multistep' | 'cosine'
    min_lr_ratio: float = 0.05
    cosine_begin_epoch: int = 0  # 0 -> right after warmup
    cosine_end_epoch: int = 0    # 0 -> last epoch
    quadratic_warmup: bool = False
    frozen_stages: int = 1
    optimizer: str = 'SGD'  # 'SGD' | 'AdamW' | 'Adam'
    backbone_lr_mult: float = 1.0
    auto_scale_base_batch: int = 16
    grad_clip: Optional[float] = None
    param_sharding: str = 'replicated'  # 'replicated' (DDP) | 'fsdp'
    log_interval: int = 50
    # 'sampled' (default): loss scalars are materialized only on steps
    # where some hook wants them (log/NaN-check iterations); on the other
    # steps a grad-only jitted step runs and XLA dead-code-eliminates the
    # primal loss reductions (~15% faster at ERD bs=16 — the torch
    # reference necessarily pays the primal every step, a TPU/XLA-only
    # win). 'every_iter' restores reference-exact windowed loss logging.
    loss_sampling: str = 'sampled'
    ckpt_dir: Optional[str] = None
    ckpt_interval_epochs: int = 1
    val_interval: int = 1


class Trainer:
    """Drives detector.loss over a data mesh with SGD; epoch-based."""

    def __init__(self, detector, train_loader, cfg: TrainerConfig,
                 teacher_variables=None, mesh=None, hooks: List[Hook] = None,
                 val_fn=None):
        self.det = detector
        self.loader = train_loader
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        # De-trap ERDConfig.num_devices: the DDP-equivalent 1/num_devices
        # scaling of the per-image distill-loss sums (gfl_erd.py:216-218)
        # must match the mesh the trainer actually runs on — a detector
        # built with the default num_devices=1 and then trained on an
        # 8-device mesh would silently overweight the distill terms 8x.
        # The trainer is the one place that knows the mesh, so it derives
        # the width and rebuilds the config; no entry point can mis-scale.
        erd_cfg = getattr(self.det, 'erd', None)
        if erd_cfg is not None and hasattr(erd_cfg, 'num_devices'):
            n_data = int(np.prod(list(self.mesh.shape.values())))
            if erd_cfg.num_devices != n_data:
                log.info('deriving ERD num_devices=%d from the mesh '
                         '(detector was built with %d)', n_data,
                         erd_cfg.num_devices)
                self.det = dataclasses.replace(
                    self.det,
                    erd=dataclasses.replace(erd_cfg, num_devices=n_data))
        self.teacher_variables = teacher_variables
        self.val_fn = val_fn
        self.hooks = hooks if hooks is not None else [
            LoggerHook(cfg.log_interval,
                       sampled=cfg.loss_sampling == 'sampled'),
            CheckInvalidLossHook()]

        self.global_batch_size = train_loader.cfg.batch_size
        self.steps_per_epoch = train_loader.steps_per_epoch(0)
        lr = auto_scale_lr(cfg.base_lr, self.global_batch_size,
                           cfg.auto_scale_base_batch)
        warmup_iters = cfg.warmup_epochs * self.steps_per_epoch \
            if cfg.warmup_epochs else cfg.warmup_iters
        if cfg.schedule == 'cosine':
            from .schedules import warmup_cosine
            begin = cfg.cosine_begin_epoch * self.steps_per_epoch \
                if cfg.cosine_begin_epoch else warmup_iters
            end = (cfg.cosine_end_epoch or cfg.epochs) * \
                self.steps_per_epoch
            self.schedule = warmup_cosine(
                lr, warmup_iters, cfg.warmup_factor, begin, end,
                cfg.min_lr_ratio, cfg.quadratic_warmup)
        else:
            milestones = [m * self.steps_per_epoch
                          for m in cfg.milestones_epochs]
            self.schedule = warmup_multistep(
                lr, warmup_iters, cfg.warmup_factor, milestones,
                cfg.gamma)
        opt = cfg.optimizer.lower()
        if opt in ('adamw', 'adam'):
            from .optim import adamw_optimizer
            self.tx = adamw_optimizer(
                self.schedule,
                # plain Adam (CornerNet recipe) = AdamW with zero decay
                weight_decay=cfg.weight_decay if opt == 'adamw' else 0.0,
                frozen_stages=cfg.frozen_stages,
                grad_clip=cfg.grad_clip,
                backbone_lr_mult=cfg.backbone_lr_mult)
        else:
            self.tx = sgd_optimizer(self.schedule, cfg.momentum,
                                    cfg.weight_decay, cfg.frozen_stages,
                                    cfg.grad_clip,
                                    backbone_lr_mult=cfg.backbone_lr_mult)
        self._build_train_steps()

    def _build_train_steps(self, pin=None):
        """(Re)jit the two train-step variants.

        ``_train_step`` materializes the per-loss scalars (log/NaN-check
        iterations); ``_train_step_light`` returns an empty loss dict so
        XLA dead-code-eliminates every primal loss reduction the backward
        pass does not need — measured ~15% faster on the ERD step at
        bs=16. ``pin`` optionally wraps the step with output-sharding
        constraints (FSDP donation).
        """
        def make(with_losses):
            def step(params, opt_state, consts, batch, teacher):
                return self._step_impl(params, opt_state, consts, batch,
                                       teacher, with_losses)
            if pin is not None:
                step = pin(step)
            return jax.jit(step, donate_argnums=(0, 1))

        self._train_step = make(True)
        self._train_step_light = make(False)

    # ------------------------------------------------------------------
    def _step_impl(self, params, opt_state, consts, batch, teacher,
                   with_losses=True):
        stateful = hasattr(self.det, 'loss_and_state')

        def loss_fn(p):
            variables = {'params': p, **consts}
            if stateful:
                # detectors with train-time mutable state (e.g. BatchNorm
                # running stats) return updated consts alongside losses
                losses, new_consts = self.det.loss_and_state(
                    variables, batch, teacher_variables=teacher) \
                    if teacher is not None else \
                    self.det.loss_and_state(variables, batch)
            else:
                losses = self.det.loss(variables, batch,
                                       teacher_variables=teacher) \
                    if teacher is not None else \
                    self.det.loss(variables, batch)
                new_consts = consts
            # dropping the loss dict from the outputs lets XLA DCE the
            # primal reductions (backward needs only their cotangents)
            return (sum(jax.tree.leaves(losses)),
                    (losses if with_losses else {}, new_consts))

        grads, (losses, new_consts) = jax.grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, losses, new_consts

    def current_lr(self, step):
        return float(self.schedule(step))

    # ------------------------------------------------------------------
    def fit(self, variables, start_epoch=0, resume=False):
        consts = {k: v for k, v in variables.items() if k != 'params'}
        # copy before replicating: the jitted step donates params/opt_state,
        # and device_put may alias the caller's arrays, which donation would
        # then delete out from under the caller.
        params = jax.tree.map(jnp.copy, variables['params'])
        if self.cfg.param_sharding == 'fsdp':
            # ZeRO-3 analogue over the same data axis: params/opt-state
            # shard leaf-wise, GSPMD all-gathers at use and reduce-
            # scatters grads; replicated DDP is the reference-equivalent
            # default
            params = shard_params_fsdp(params, self.mesh)
            consts = replicate(consts, self.mesh)
            opt_state = shard_params_fsdp(jax.jit(self.tx.init)(params),
                                          self.mesh)
            # donation needs output layouts == input layouts; pin them,
            # otherwise GSPMD may pick different output shardings and
            # break the buffer aliasing
            psh = jax.tree.map(lambda x: x.sharding, params)
            osh = jax.tree.map(lambda x: x.sharding, opt_state)

            def pin(step_fn):
                def _pinned(p, o, c, b, t):
                    p2, o2, losses, c2 = step_fn(p, o, c, b, t)
                    p2 = jax.lax.with_sharding_constraint(p2, psh)
                    o2 = jax.lax.with_sharding_constraint(o2, osh)
                    return p2, o2, losses, c2
                return _pinned

            self._build_train_steps(pin=pin)
        else:
            params = replicate(params, self.mesh)
            consts = replicate(consts, self.mesh)
            opt_state = jax.jit(self.tx.init)(params)
            opt_state = replicate(opt_state, self.mesh)
        teacher = (replicate(self.teacher_variables, self.mesh)
                   if self.teacher_variables is not None else None)

        step = start_epoch * self.steps_per_epoch
        if resume and self.cfg.ckpt_dir:
            path = latest_checkpoint(self.cfg.ckpt_dir)
            if path:
                state = load_checkpoint(path, dict(
                    params=params, consts=consts, opt_state=opt_state,
                    step=np.asarray(0)))
                params, opt_state = state['params'], state['opt_state']
                consts = state.get('consts', consts)
                step = int(state['step'])
                start_epoch = step // self.steps_per_epoch
                log.info(f'resumed from {path} at step {step}')

        for h in self.hooks:
            h.before_train(self)

        for epoch in range(start_epoch, self.cfg.epochs):
            log.info(f'epoch {epoch + 1}/{self.cfg.epochs}')
            for h in self.hooks:
                h.before_epoch(self, epoch)
            for batch in self.loader.epoch(epoch):
                batch = shard_batch(batch, self.mesh)
                # grad-only step unless a hook consumes losses this iter;
                # skipping the host float() sync on those steps also lets
                # dispatch run ahead of the device
                want = any(h.wants_losses(step) for h in self.hooks)
                step_fn = (self._train_step if want
                           else self._train_step_light)
                params, opt_state, losses, consts = step_fn(
                    params, opt_state, consts, batch, teacher)
                self.latest_params = params  # hooks (e.g. EMA) read this
                host_losses = {k: float(v) for k, v in losses.items()}
                for h in self.hooks:
                    h.after_iter(self, step, host_losses)
                step += 1
            for h in self.hooks:
                h.after_epoch(self, epoch)
            if self.cfg.ckpt_dir and \
                    (epoch + 1) % self.cfg.ckpt_interval_epochs == 0:
                # consts (e.g. frozen batch_stats from a pretrained
                # backbone) must ride along or a restored model would fall
                # back to init statistics.
                save_checkpoint(self.cfg.ckpt_dir, step, dict(
                    params=params, consts=consts, opt_state=opt_state,
                    step=np.asarray(step)))
            if self.val_fn and (epoch + 1) % self.cfg.val_interval == 0:
                metrics = self.val_fn({'params': params, **consts})
                log.info(f'epoch {epoch + 1} val: ' + ' '.join(
                    f'{k} {v:.4f}' for k, v in metrics.items()
                    if isinstance(v, float)))
                for h in self.hooks:
                    h.after_val(self, epoch, metrics)

        return {'params': params, **consts}


class SemiTrainer(Trainer):
    """Semi-supervised trainer: EMA mean-teacher updated inside the jitted
    step (reference mean_teacher_hook.py:13 + semi_base.py data flow).

    The loader must be a ``data.loader.SemiDataLoader`` yielding
    ``{'sup', 'unsup_weak', 'unsup_strong'}`` dicts; the detector must
    expose ``semi_loss(variables, sup, weak, strong, teacher_variables=)``
    (e.g. SoftTeacherDetector). Teacher params start as a copy of the
    student and follow ``ema = m * ema + (1 - m) * student`` each step —
    the whole grad + SGD + EMA chain is one compiled program, so the
    teacher never leaves the device.
    """

    def __init__(self, detector, train_loader, cfg: TrainerConfig,
                 ema_momentum: float = 0.999, mesh=None,
                 hooks: List[Hook] = None, val_fn=None):
        super().__init__(detector, train_loader, cfg, mesh=mesh,
                         hooks=hooks, val_fn=val_fn)
        self.ema_momentum = ema_momentum
        self._train_step = jax.jit(self._semi_step_impl,
                                   donate_argnums=(0, 1, 4))

    def _semi_step_impl(self, params, opt_state, consts, batch,
                        teacher_params):
        def loss_fn(p):
            variables = {'params': p, **consts}
            t_vars = {'params': teacher_params, **consts}
            losses = self.det.semi_loss(
                variables, batch['sup'], batch['unsup_weak'],
                batch['unsup_strong'], teacher_variables=t_vars)
            return sum(jax.tree.leaves(losses)), losses

        (_, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        m = self.ema_momentum
        teacher_params = jax.tree.map(
            lambda e, p: e * m + p.astype(e.dtype) * (1 - m),
            teacher_params, params)
        return params, opt_state, losses, teacher_params

    def fit(self, variables, start_epoch=0, resume=False):
        consts = {k: v for k, v in variables.items() if k != 'params'}
        params = jax.tree.map(jnp.copy, variables['params'])
        params = replicate(params, self.mesh)
        consts = replicate(consts, self.mesh)
        opt_state = jax.jit(self.tx.init)(params)
        opt_state = replicate(opt_state, self.mesh)
        teacher_params = jax.tree.map(jnp.copy, params)

        step = start_epoch * self.steps_per_epoch
        if resume and self.cfg.ckpt_dir:
            path = latest_checkpoint(self.cfg.ckpt_dir)
            if path:
                state = load_checkpoint(path, dict(
                    params=params, consts=consts, opt_state=opt_state,
                    teacher_params=teacher_params, step=np.asarray(0)))
                params, opt_state = state['params'], state['opt_state']
                consts = state.get('consts', consts)
                teacher_params = state.get('teacher_params',
                                           teacher_params)
                step = int(state['step'])
                start_epoch = step // self.steps_per_epoch
                log.info(f'resumed from {path} at step {step}')

        for h in self.hooks:
            h.before_train(self)

        for epoch in range(start_epoch, self.cfg.epochs):
            log.info(f'epoch {epoch + 1}/{self.cfg.epochs}')
            for h in self.hooks:
                h.before_epoch(self, epoch)
            for batch in self.loader.epoch(epoch):
                batch = shard_batch(batch, self.mesh)
                params, opt_state, losses, teacher_params = \
                    self._train_step(params, opt_state, consts, batch,
                                     teacher_params)
                self.latest_params = params
                self.ema_params = teacher_params
                host_losses = {k: float(v) for k, v in losses.items()}
                for h in self.hooks:
                    h.after_iter(self, step, host_losses)
                step += 1
            for h in self.hooks:
                h.after_epoch(self, epoch)
            if self.cfg.ckpt_dir and \
                    (epoch + 1) % self.cfg.ckpt_interval_epochs == 0:
                save_checkpoint(self.cfg.ckpt_dir, step, dict(
                    params=params, consts=consts, opt_state=opt_state,
                    teacher_params=teacher_params, step=np.asarray(step)))
            if self.val_fn and (epoch + 1) % self.cfg.val_interval == 0:
                # semi-supervised protocol validates the TEACHER
                metrics = self.val_fn({'params': teacher_params, **consts})
                log.info(f'epoch {epoch + 1} val(teacher): ' + ' '.join(
                    f'{k} {v:.4f}' for k, v in metrics.items()
                    if isinstance(v, float)))
                for h in self.hooks:
                    h.after_val(self, epoch, metrics)

        return {'student': {'params': params, **consts},
                'teacher': {'params': teacher_params, **consts}}


def run_evaluation(detector, variables, loader, metric, max_batches=None,
                   predict_fn=None):
    """Test loop (tools/test.py analogue): predict -> accumulate -> compute.

    Detectors with a mask branch return (DetResults, masks); the masks ride
    along to the metric for segm scoring. ``predict_fn(variables, batch)``
    overrides the plain forward (e.g. models.tta.tta_predict_multiscale).
    """
    if predict_fn is None:
        predict_fn = detector.predict_jit
    n = 0
    for epoch_batch in loader.epoch(0):
        res = predict_fn(variables, epoch_batch)
        if isinstance(res, tuple):
            res, masks = res
            metric.process_batch(res, epoch_batch['meta'], masks=masks)
        else:
            metric.process_batch(res, epoch_batch['meta'])
        n += 1
        if max_batches is not None and n >= max_batches:
            break
    return metric.compute_metrics()
