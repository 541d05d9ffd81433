#!/usr/bin/env python
"""Upgrade an mmdet-1.x checkpoint to the modern (2.x/3.x) key layout.

Counterpart of ``reference/tools/model_converters/upgrade_model_version.py``.
The breaking changes it reverses (reference :45-116, :141-180):

  * mmdet 1.x softmax heads put BACKGROUND at channel 0; 2.x+ puts it LAST.
    ``reorder_cls_channel`` rolls channel 0 to the end (per class-group for
    convs whose out_channels is a multiple of num_classes).
  * 1.x regression heads predicted a 4-vector for the background class too;
    ``truncate_reg_channel`` drops class-group 0 from ``fc_reg``.
  * 1.x mask heads had a background logit map; ``truncate_cls_channel``
    drops it from ``conv_logits``.
  * two-stage heads moved under the ``roi_head.`` scope.

The output is a torch-layout state dict consumable by
``erd_tpu.models.weight_import.load_torch_checkpoint_file`` (and by the
reference itself). Config parsing is intentionally NOT reproduced — pass
``--two-stage`` explicitly instead of shipping an mmengine dependency.

Usage:
    python tools/model_converters/upgrade_model_version.py in.pth out.pth \
        --num-classes 81 [--two-stage]
"""
import argparse
import re
import sys
from collections import OrderedDict

import numpy as np

HEAD_SCOPES = ('bbox_head', 'mask_head', 'semantic_head', 'grid_head',
               'mask_iou_head')
CLS_PAT = re.compile(
    r'(conv_cls|retina_cls|rpn_cls|fc_cls|fcos_cls|fovea_cls)\.'
    r'(weight|bias)')
REG_PAT = re.compile(r'(fc_reg)\.(weight|bias)')
MASK_PAT = re.compile(r'(conv_logits)\.(weight|bias)')


def reorder_cls_channel(val, num_classes):
    """Move the background channel from slot 0 to the last slot."""
    if val.ndim == 1:
        return np.concatenate([val[1:], val[:1]], axis=0)
    out_channels = val.shape[0]
    if out_channels != num_classes and out_channels % num_classes == 0:
        g = val.reshape(-1, num_classes, *val.shape[1:])
        g = np.concatenate([g[:, 1:], g[:, :1]], axis=1)
        return g.reshape(val.shape)
    if out_channels == num_classes:
        return np.concatenate([val[1:], val[:1]], axis=0)
    return val  # class-agnostic / rpn objectness: nothing to reorder


def truncate_reg_channel(val, num_classes):
    """Drop the background class-group from a per-class box regressor."""
    if val.ndim == 1:
        if val.shape[0] % num_classes == 0:
            return val.reshape(num_classes, -1)[1:].reshape(-1)
        return val
    if val.shape[0] % num_classes == 0:
        g = val.reshape(num_classes, -1, *val.shape[1:])[1:]
        return g.reshape(-1, *val.shape[1:])
    return val


def truncate_cls_channel(val, num_classes):
    """Drop the background mask-logit channel."""
    if val.ndim == 1:
        if val.shape[0] % num_classes == 0:
            return val[1:]
        return val
    if val.shape[0] % num_classes == 0:
        g = val.reshape(num_classes, *val.shape[1:])[1:]
        return g.reshape(-1, *val.shape[1:])
    return val


def upgrade_state_dict(state, num_classes, two_stage=False):
    out = OrderedDict()
    for key, val in state.items():
        v = np.asarray(val)
        new_key = key
        if two_stage and key.startswith(HEAD_SCOPES):
            new_key = 'roi_head.' + key
        if CLS_PAT.search(new_key):
            v = reorder_cls_channel(v, num_classes)
        elif REG_PAT.search(new_key):
            v = truncate_reg_channel(v, num_classes)
        elif MASK_PAT.search(new_key):
            v = truncate_cls_channel(v, num_classes)
        out[new_key] = v
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('src')
    p.add_argument('dst')
    p.add_argument('--num-classes', type=int, default=81,
                   help='1.x class count INCLUDING background (coco: 81)')
    p.add_argument('--two-stage', action='store_true',
                   help='prefix head scopes with roi_head. (R-CNN family)')
    args = p.parse_args(argv)
    import torch
    blob = torch.load(args.src, map_location='cpu', weights_only=False)
    state = blob.get('state_dict', blob) if isinstance(blob, dict) else blob
    state = {k: v.numpy() if hasattr(v, 'numpy') else np.asarray(v)
             for k, v in state.items()}
    out = upgrade_state_dict(state, args.num_classes, args.two_stage)
    torch.save(dict(state_dict={k: torch.from_numpy(
        np.ascontiguousarray(v)) for k, v in out.items()}), args.dst)
    print(f'upgraded {len(out)} keys -> {args.dst}')


if __name__ == '__main__':
    sys.exit(main())
