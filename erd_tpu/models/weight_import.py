"""Torch checkpoint import: mmdet/torchvision state dicts -> flax variables.

Replaces the reference's ``load_checkpoint`` path (mmengine) and the
torchvision-pretrained backbone init
(configs/gfl_increment/*.py init_cfg 'torchvision://resnet50').

Also provides the ERD cross-stage surgery: widening the ``gfl_cls`` conv from
``ori_num_classes`` to ``num_classes`` outputs by concatenating
freshly-initialized rows onto the teacher checkpoint, mirroring
/root/reference/mmdet/models/detectors/gfl_increment_erd.py:67-93 — but as a
pure pytree transform.
"""
from __future__ import annotations

import re
from typing import Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch conv weight (O, I, kh, kw) -> flax kernel (kh, kw, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def _tv_resnet_key(k: str):
    """torchvision resnet key -> (our param path, kind)."""
    if k.startswith('fc.'):
        return None
    m = re.match(r'^conv1\.weight$', k)
    if m:
        return ('stem_conv', 'kernel')
    m = re.match(r'^bn1\.(\w+)$', k)
    if m:
        return ('stem_bn', m.group(1))
    m = re.match(r'^layer(\d)\.(\d+)\.conv(\d)\.weight$', k)
    if m:
        return (f'layer{m.group(1)}_block{m.group(2)}/conv{m.group(3)}',
                'kernel')
    m = re.match(r'^layer(\d)\.(\d+)\.bn(\d)\.(\w+)$', k)
    if m:
        return (f'layer{m.group(1)}_block{m.group(2)}/bn{m.group(3)}',
                m.group(4))
    m = re.match(r'^layer(\d)\.(\d+)\.downsample\.0\.weight$', k)
    if m:
        return (f'layer{m.group(1)}_block{m.group(2)}/downsample_conv',
                'kernel')
    m = re.match(r'^layer(\d)\.(\d+)\.downsample\.1\.(\w+)$', k)
    if m:
        return (f'layer{m.group(1)}_block{m.group(2)}/downsample_bn',
                m.group(3))
    return None


def _set(tree: Dict, path: str, value):
    parts = path.split('/')
    node = tree
    for p in parts[:-1]:
        node = node[p]
    leaf = parts[-1]
    assert leaf in node, f'unknown leaf {path}'
    got, want = value.shape, node[leaf].shape
    assert got == want, f'{path}: shape {got} != {want}'
    node[leaf] = jnp.asarray(value, node[leaf].dtype)


def _place_norm(params, stats, base: str, kind: str, value):
    """Route a torch BN/GN field to params (scale/bias) or batch_stats."""
    if kind == 'weight':
        _set(params, base + '/scale', value)
    elif kind == 'bias':
        _set(params, base + '/bias', value)
    elif kind == 'running_mean':
        _set(stats, base + '/mean', value)
    elif kind == 'running_var':
        _set(stats, base + '/var', value)
    elif kind == 'num_batches_tracked':
        pass
    else:
        raise KeyError(kind)


def load_torchvision_resnet(variables, state_dict: Mapping[str, np.ndarray],
                            scope: str = 'backbone'):
    """Load a torchvision resnet state_dict into the backbone scope.

    Args:
        variables: flax variables of a detector ({'params', 'batch_stats'}).
        state_dict: str -> numpy (caller converts torch tensors).
    Returns new variables (input untouched).
    """
    all_params = _to_mutable(variables['params'])
    all_stats = _to_mutable(variables.get('batch_stats', {}))
    params = all_params[scope] if scope else all_params
    stats = (all_stats.get(scope, {}) if scope else all_stats)
    n_loaded = 0
    for k, v in state_dict.items():
        if k.endswith('num_batches_tracked'):
            continue
        v = np.asarray(v)
        routed = _tv_resnet_key(k)
        if routed is None:
            continue
        base, kind = routed
        if kind == 'kernel':
            _set(params, base + '/kernel', _conv_kernel(v))
        else:
            _place_norm(params, stats, base, kind, v)
        n_loaded += 1
    out = dict(variables)
    if scope:
        all_params[scope] = params
        if stats:
            all_stats[scope] = stats
    out['params'] = all_params
    if stats or all_stats:
        out['batch_stats'] = all_stats
    return out, n_loaded


def _mmdet_key(k: str):
    """mmdet GFL checkpoint key -> (path-in-variables, kind)."""
    if k.startswith('backbone.'):
        routed = _tv_resnet_key(k[len('backbone.'):].replace(
            'bn1.', 'bn1.', 1))
        # backbone keys in mmdet match torchvision naming
        if routed is None:
            return None
        base, kind = routed
        return ('backbone/' + base, kind)
    m = re.match(r'^neck\.lateral_convs\.(\d+)\.conv\.(weight|bias)$', k)
    if m:
        return (f'neck/lateral_{int(m.group(1)) + 1}', _wk(m.group(2)))
    m = re.match(r'^neck\.fpn_convs\.(\d+)\.conv\.(weight|bias)$', k)
    if m:
        i = int(m.group(1))
        name = f'neck/fpn_conv_{i}' if i < 3 else f'neck/extra_conv_{i - 3}'
        return (name, _wk(m.group(2)))
    m = re.match(r'^bbox_head\.(cls|reg)_convs\.(\d+)\.conv\.(weight|bias)$',
                 k)
    if m:
        return (f'bbox_head/{m.group(1)}_conv_{m.group(2)}/conv',
                _wk(m.group(3)))
    m = re.match(r'^bbox_head\.(cls|reg)_convs\.(\d+)\.gn\.(weight|bias)$', k)
    if m:
        kind = 'scale' if m.group(3) == 'weight' else 'bias'
        return (f'bbox_head/{m.group(1)}_conv_{m.group(2)}/gn', kind)
    m = re.match(r'^bbox_head\.gfl_(cls|reg)\.(weight|bias)$', k)
    if m:
        return (f'bbox_head/gfl_{m.group(1)}', _wk(m.group(2)))
    m = re.match(r'^bbox_head\.scales\.(\d+)\.scale$', k)
    if m:
        return (f'bbox_head/scale_{m.group(1)}', 'scale')
    return None


def _wk(torch_kind):
    return 'kernel' if torch_kind == 'weight' else 'bias'


def _to_mutable(d):
    if isinstance(d, Mapping):
        return {k: _to_mutable(v) for k, v in d.items()}
    return d


def load_mmdet_state_dict(variables, state_dict: Mapping[str, np.ndarray],
                          strict=True):
    """Load a full mmdet GFL detector state_dict (backbone+neck+bbox_head)."""
    params = _to_mutable(variables['params'])
    stats = _to_mutable(variables.get('batch_stats', {}))
    missing = []
    n = 0
    for k, v in state_dict.items():
        if k.endswith('num_batches_tracked'):
            continue
        v = np.asarray(v)
        routed = _mmdet_key(k)
        if routed is None:
            missing.append(k)
            continue
        path, kind = routed
        if kind == 'kernel':
            if v.ndim == 4:
                _set(params, path + '/kernel', _conv_kernel(v))
            else:
                _set(params, path + '/kernel', v.T)
        elif kind in ('weight', 'bias', 'scale'):
            _set(params, path + '/' + kind if kind != 'weight' else
                 path + '/scale', v)
        elif kind in ('running_mean', 'running_var'):
            _place_norm(params, stats, path, kind, v)
        else:
            raise KeyError(kind)
        n += 1
    if strict and missing:
        raise KeyError(f'unmapped checkpoint keys: {missing[:10]}...'
                       if len(missing) > 10 else
                       f'unmapped checkpoint keys: {missing}')
    out = dict(variables)
    out['params'] = params
    if stats:
        out['batch_stats'] = stats
    return out, n


def load_torch_checkpoint_file(variables, path, strict=True):
    """torch.load an mmdet .pth and import it (CPU-only torch is fine)."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    state = ckpt.get('state_dict', ckpt) if isinstance(ckpt, dict) else ckpt
    state = {k[7:] if k.startswith('module.') else k:
             v.numpy() if hasattr(v, 'numpy') else np.asarray(v)
             for k, v in state.items()}
    return load_mmdet_state_dict(variables, state, strict=strict)


# ---------------------------------------------------------------------------
# ERD cross-stage widening
# ---------------------------------------------------------------------------
def widen_cls_head(teacher_variables, student_variables, ori_num_classes):
    """Start the student as the teacher, with fresh rows for new classes.

    Pure-pytree mirror of _load_checkpoint_for_new_model
    (gfl_increment_erd.py:83-88): every parameter copies from the teacher
    except ``bbox_head/gfl_cls``, whose output channels [ori_num_classes:)
    keep the student's fresh initialization.
    """
    t_params = _to_mutable(teacher_variables['params'])
    s_params = _to_mutable(student_variables['params'])

    def merge(t, s, path=''):
        if isinstance(t, dict):
            return {k: merge(t[k], s[k], path + '/' + k) for k in s}
        if path.endswith('gfl_cls/kernel'):
            return jnp.concatenate([t, s[..., ori_num_classes:]], axis=-1)
        if path.endswith('gfl_cls/bias'):
            return jnp.concatenate([t, s[ori_num_classes:]], axis=0)
        assert t.shape == s.shape, f'{path}: {t.shape} vs {s.shape}'
        return t

    out = dict(student_variables)
    out['params'] = merge(t_params, s_params)
    if 'batch_stats' in teacher_variables:
        out['batch_stats'] = _to_mutable(teacher_variables['batch_stats'])
    return out
