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


def route_params(tx, frozen_stages: int = -1,
                 backbone_lr_mult: float = 1.0):
    """Label-route the update: frozen backbone prefixes get zero updates
    and (optionally) the rest of the backbone gets a scaled LR — the
    paramwise_cfg ``lr_mult`` analogue (e.g. YOLOF backbone 1/3,
    Mask2Former backbone 0.1)."""
    if frozen_stages < 0 and backbone_lr_mult == 1.0:
        return tx
    frozen_prefixes = resnet_frozen_paths(frozen_stages) \
        if frozen_stages >= 0 else ()

    def label(params):
        def walk(tree, path):
            if isinstance(tree, dict):
                return {k: walk(v, path + (k,)) for k, v in tree.items()}
            if len(path) >= 2 and path[0] == 'backbone' and any(
                    path[1].startswith(p) for p in frozen_prefixes):
                return 'frozen'
            if path and path[0] == 'backbone' and backbone_lr_mult != 1.0:
                return 'backbone'
            return 'train'

        return walk(params, ())

    return optax.multi_transform(
        {'train': tx,
         'backbone': optax.chain(tx, optax.scale(backbone_lr_mult))
         if backbone_lr_mult != 1.0 else tx,
         'frozen': optax.set_to_zero()}, label)


def sgd_optimizer(schedule, momentum: float = 0.9,
                  weight_decay: float = 1e-4, frozen_stages: int = 1,
                  grad_clip: Optional[float] = None,
                  accumulate_steps: int = 1,
                  backbone_lr_mult: float = 1.0):
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
    tx = route_params(optax.chain(*chain), frozen_stages,
                      backbone_lr_mult)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx


def swin_layer_id(path, num_layers):
    """Depth index of a swin/ViT-style backbone param for layer-wise decay.

    Mirrors the intent of get_layer_id_for_convnext
    (mmdet/engine/optimizers/layer_decay_optimizer_constructor.py:12-52):
    embeddings get id 0, transformer blocks get 1..num_layers in depth
    order, everything outside the backbone gets num_layers + 1 (full LR).
    Param paths follow backbones/swin.py naming
    (patch_embed / stage{s}_block{b} / downsample{s} / out_norm{s}).
    """
    if not path or path[0] != 'backbone':
        return num_layers + 1
    name = path[1] if len(path) > 1 else ''
    if name.startswith(('patch_embed', 'patch_norm')):
        return 0
    if name.startswith('stage'):
        stage, block = name.split('_block')
        # depths like swin-T (2,2,6,2): flatten to a running block index
        sid = int(stage[5:])
        return min(sum((2, 2, 6, 2)[:sid]) + int(block) + 1, num_layers)
    if name.startswith('downsample'):
        sid = int(name[len('downsample'):])
        return min(sum((2, 2, 6, 2)[:sid + 1]), num_layers)
    return num_layers  # out_norms ride with the last block
    # (resnet variants can pass their own layer_id_fn below)


def layer_wise_lr_scale(decay_rate: float, num_layers: int,
                        layer_id_fn: Callable = swin_layer_id):
    """optax transform scaling updates by decay_rate^(num_layers+1-id).

    The TPU-idiomatic form of LearningRateDecayOptimizerConstructor
    (layer_decay_optimizer_constructor.py:82-172): instead of materialized
    torch param groups, a pure per-leaf scale folded into the jitted
    update.
    """
    import optax as _optax

    def init(params):
        del params
        return _optax.EmptyState()

    def update(updates, state, params=None):
        del params

        def walk(tree, path):
            if isinstance(tree, dict):
                return {k: walk(v, path + (k,)) for k, v in tree.items()}
            lid = layer_id_fn(path, num_layers)
            return tree * (decay_rate ** (num_layers + 1 - lid))

        return walk(updates, ()), state

    return _optax.GradientTransformation(init, update)


def layer_decay_adamw(schedule, num_layers: int, decay_rate: float = 0.9,
                      betas=(0.9, 0.999), weight_decay: float = 0.05,
                      layer_id_fn: Callable = swin_layer_id,
                      grad_clip: Optional[float] = None):
    """AdamW with layer-wise LR decay + no-decay for 1-D params/biases.

    The ConvNeXt/ViT fine-tuning recipe: earlier backbone layers get
    geometrically smaller LRs; norms/biases (ndim == 1) skip weight decay
    (layer_decay_optimizer_constructor.py:110-117).
    """
    chain = []
    if grad_clip is not None:
        chain.append(optax.clip_by_global_norm(grad_clip))

    def decay_mask(params):
        return jax.tree.map(lambda p: p.ndim > 1, params)

    chain += [
        optax.scale_by_adam(b1=betas[0], b2=betas[1]),
        optax.masked(optax.add_decayed_weights(weight_decay), decay_mask),
        layer_wise_lr_scale(decay_rate, num_layers, layer_id_fn),
        optax.scale_by_learning_rate(schedule),
    ]
    return optax.chain(*chain)


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
    return route_params(optax.chain(*chain), frozen_stages,
                        backbone_lr_mult)
