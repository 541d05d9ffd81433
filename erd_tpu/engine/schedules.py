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


def auto_scale_lr(base_lr: float, batch_size: int,
                  base_batch_size: int = 16) -> float:
    """Linear LR scaling rule."""
    return base_lr * batch_size / base_batch_size
