"""EMA / mean-teacher parameter averaging.

Covers the roles of MeanTeacherHook (/root/reference/mmdet/engine/hooks/
mean_teacher_hook.py:13 — EMA teacher for semi-supervised detectors) and the
ExpMomentumEMA layer (models/layers/ema.py) as a pure pytree update usable
inside the jitted train step or from a hook.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .hooks import Hook


def ema_update(ema_params, params, momentum=0.999):
    """ema = momentum * ema + (1 - momentum) * params."""
    return jax.tree.map(
        lambda e, p: e * momentum + p.astype(e.dtype) * (1 - momentum),
        ema_params, params)


def exp_momentum(base_update, step, gamma=2000.0):
    """YOLOX ExpMomentumEMA warmup: the per-step UPDATE fraction starts near
    1 (copy the student) and decays to ``base_update`` (e.g. 2e-4):
    (1 - base) * exp(-(1 + step) / gamma) + base."""
    return (1 - base_update) * jnp.exp(-(1.0 + step) / gamma) + base_update


class MeanTeacherHook(Hook):
    """Maintains an EMA copy of the trained params on the trainer.

    The trainer exposes ``trainer.ema_params`` after the first iteration;
    semi-supervised recipes read the teacher from there.
    """

    def __init__(self, momentum=0.999, interval=1):
        self.momentum = momentum
        self.interval = interval
        self._update = jax.jit(ema_update, static_argnames=())

    def before_train(self, trainer):
        trainer.ema_params = None

    def wants_losses(self, step):
        return False

    def after_iter(self, trainer, step, losses):
        if (step + 1) % self.interval:
            return
        params = trainer.latest_params
        if getattr(trainer, 'ema_params', None) is None:
            trainer.ema_params = jax.tree.map(jnp.copy, params)
        else:
            trainer.ema_params = self._update(trainer.ema_params, params,
                                              self.momentum)
