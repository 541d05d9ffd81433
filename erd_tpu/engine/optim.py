"""Optimizer: SGD+momentum+weight-decay with frozen-stage masking.

Reproduces the reference recipe (configs/gfl_increment/*.py optim_wrapper:
SGD lr=0.01, momentum=0.9, weight_decay=1e-4) in torch update order
(decay added to the gradient BEFORE the momentum buffer), and realises
``frozen_stages=1`` + teacher freezing (resnet.py:613-629,
gfl_increment_erd.py:112-116) as a zero-update optimizer mask instead of
mutable requires_grad state.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import optax


def resnet_frozen_paths(frozen_stages: int = 1):
    """Prefixes (within params['backbone']) frozen by ``frozen_stages``."""
    prefixes = []
    if frozen_stages >= 0:
        prefixes += ['stem_conv', 'stem_bn']
    for s in range(1, frozen_stages + 1):
        prefixes.append(f'layer{s}_')
    return tuple(prefixes)


def _freeze_label_fn(frozen_stages: int) -> Callable:
    prefixes = resnet_frozen_paths(frozen_stages)

    def label(params):
        def walk(tree, path):
            if isinstance(tree, dict):
                return {k: walk(v, path + (k,)) for k, v in tree.items()}
            if len(path) >= 2 and path[0] == 'backbone' and any(
                    path[1].startswith(p) for p in prefixes):
                return 'frozen'
            return 'train'

        return walk(params, ())

    return label


def sgd_optimizer(schedule, momentum: float = 0.9,
                  weight_decay: float = 1e-4, frozen_stages: int = 1,
                  grad_clip: Optional[float] = None,
                  accumulate_steps: int = 1):
    """torch-order SGD: g += wd*w; buf = mu*buf + g; w -= lr*buf.

    ``accumulate_steps > 1`` wraps the chain in optax.MultiSteps — the
    GradientCumulativeOptimWrapper analogue for fitting large effective
    batches on one chip.
    """
    chain = []
    if grad_clip is not None:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain += [
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_learning_rate(schedule),
    ]
    tx = optax.chain(*chain)
    if frozen_stages >= 0:
        tx = optax.multi_transform(
            {'train': tx, 'frozen': optax.set_to_zero()},
            _freeze_label_fn(frozen_stages))
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx


def adamw_optimizer(schedule, betas=(0.9, 0.999), weight_decay: float = 1e-4,
                    frozen_stages: int = -1,
                    grad_clip: Optional[float] = None,
                    backbone_lr_mult: float = 1.0):
    """AdamW (the DETR-family recipe; optionally a reduced backbone LR
    via a label-routed scale, mirroring paramwise lr_mult configs)."""
    chain = []
    if grad_clip is not None:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain += [
        optax.scale_by_adam(b1=betas[0], b2=betas[1]),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(schedule),
    ]
    tx = optax.chain(*chain)
    labels_needed = frozen_stages >= 0 or backbone_lr_mult != 1.0

    if labels_needed:
        frozen_prefixes = resnet_frozen_paths(max(frozen_stages, -1)) \
            if frozen_stages >= 0 else ()

        def label(params):
            def walk(tree, path):
                if isinstance(tree, dict):
                    return {k: walk(v, path + (k,)) for k, v in
                            tree.items()}
                if len(path) >= 2 and path[0] == 'backbone' and any(
                        path[1].startswith(p) for p in frozen_prefixes):
                    return 'frozen'
                if path and path[0] == 'backbone' and \
                        backbone_lr_mult != 1.0:
                    return 'backbone'
                return 'train'

            return walk(params, ())

        tx = optax.multi_transform(
            {'train': tx,
             'backbone': optax.chain(tx, optax.scale(backbone_lr_mult))
             if backbone_lr_mult != 1.0 else tx,
             'frozen': optax.set_to_zero()}, label)
    return tx
