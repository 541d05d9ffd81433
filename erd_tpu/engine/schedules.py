"""LR schedules: linear warmup + multi-step decay (the reference 1x recipe).

Mirrors configs/_base_/schedules/schedule_1x.py:7-17 — LinearLR warmup over
500 iters starting at factor 0.001, then MultiStepLR epoch milestones [8, 11]
with gamma 0.1 — and the linear ``auto_scale_lr`` rule
(tools/train.py:99-109, base_batch_size=16).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import optax


def warmup_multistep(base_lr: float, warmup_iters: int = 500,
                     warmup_factor: float = 0.001,
                     milestones_steps: Sequence[int] = (),
                     gamma: float = 0.1) -> optax.Schedule:
    """Per-STEP schedule; milestones are given in steps (epoch*steps/epoch)."""
    milestones = sorted(int(m) for m in milestones_steps)

    def schedule(count):
        count = jnp.asarray(count)
        # linear warmup from base_lr*warmup_factor to base_lr
        frac = jnp.clip(count / max(warmup_iters, 1), 0.0, 1.0)
        warm = warmup_factor + (1.0 - warmup_factor) * frac
        decay = jnp.asarray(1.0)
        for m in milestones:
            decay = decay * jnp.where(count >= m, gamma, 1.0)
        return base_lr * warm * decay

    return schedule


def warmup_cosine(base_lr: float, warmup_iters: int = 1000,
                  warmup_factor: float = 1e-5,
                  cosine_begin_step: int = 0,
                  cosine_end_step: int = 1,
                  min_lr_ratio: float = 0.05,
                  quadratic_warmup: bool = False) -> optax.Schedule:
    """Warmup + cosine annealing, the YOLOX/RTMDet recipes.

    Mirrors the reference param_scheduler stacks:
      * YOLOX (yolox_s_8xb8-300e_coco.py): QuadraticWarmupLR over the
        first 5 epochs, CosineAnnealingLR to ``base_lr*min_lr_ratio``
        between epochs 5 and 285, then ConstantLR for the last 15.
      * RTMDet (rtmdet_s_8xb32-300e_coco.py): LinearLR over 1000 iters,
        flat until epoch 150, cosine to 300.

    All arguments are in STEPS. After ``cosine_end_step`` the LR holds at
    ``base_lr * min_lr_ratio``; between warmup and ``cosine_begin_step``
    it holds at ``base_lr``.
    """
    eta_min = base_lr * min_lr_ratio
    span = max(cosine_end_step - cosine_begin_step, 1)

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        frac = jnp.clip(count / max(warmup_iters, 1), 0.0, 1.0)
        if quadratic_warmup:
            warm = frac * frac
        else:
            warm = warmup_factor + (1.0 - warmup_factor) * frac
        t = jnp.clip((count - cosine_begin_step) / span, 0.0, 1.0)
        cos = eta_min + (base_lr - eta_min) * 0.5 * \
            (1.0 + jnp.cos(jnp.pi * t))
        return jnp.where(count < warmup_iters, base_lr * warm, cos)

    return schedule


def auto_scale_lr(base_lr: float, batch_size: int,
                  base_batch_size: int = 16) -> float:
    """Linear LR scaling rule."""
    return base_lr * batch_size / base_batch_size
