#!/usr/bin/env python
"""Convert a pycls RegNet checkpoint into erd_tpu-importable form.

Counterpart of ``reference/tools/model_converters/regnet2mmdet.py``, which
renames pycls keys (``stem.conv``, ``s{i}.b{j}.f.{a,b,c}``, ``proj``) into
torchvision-style ``conv1/bn1/layer{i}.{j}.*`` naming. We perform the same
rename — erd_tpu's RegNet uses the identical ``layer{s}_block{b}/conv{i}``
scope layout as ResNet (models/backbones/regnet.py), so the renamed dict
feeds straight into ``erd_tpu.models.weight_import.load_torchvision_resnet``
(NCHW->HWIO transposition happens there, on device-side import, NOT here:
the artifact stays a torch-layout state dict so it is also loadable by the
reference).

Usage:
    python tools/model_converters/regnet2erd.py in.pth out.pth
"""
import argparse
import sys
from collections import OrderedDict


def convert_key(key):
    """pycls key -> torchvision-style key (None = drop, e.g. momenta)."""
    if 'model_state' in key or key.endswith('num_batches_tracked'):
        return None
    if key.startswith('stem.conv'):
        return key.replace('stem.conv', 'conv1')
    if key.startswith('stem.bn'):
        return key.replace('stem.bn', 'bn1')
    if key.startswith('head.fc'):
        return key.replace('head.fc', 'fc')
    if key.startswith('s'):
        # s{stage}.b{block}.{proj|bn|f.{a,a_bn,b,b_bn,c,c_bn,se}}.{leaf}
        parts = key.split('.')
        stage, block, module = parts[0], parts[1], parts[2]
        layer = f'layer{int(stage[1:])}'
        blk = int(block[1:]) - 1
        leaf = parts[-1]
        if module == 'proj':
            return f'{layer}.{blk}.downsample.0.{leaf}'
        if module == 'bn' and int(block[1:]) == 1:
            return f'{layer}.{blk}.downsample.1.{leaf}'
        if module == 'f':
            sub = parts[3]
            names = {'a': 'conv1', 'a_bn': 'bn1', 'b': 'conv2',
                     'b_bn': 'bn2', 'c': 'conv3', 'c_bn': 'bn3'}
            if sub not in names:
                raise ValueError(f'unsupported pycls submodule in {key} '
                                 '(SE blocks are not part of the RegNetX '
                                 'family erd_tpu ships)')
            return f'{layer}.{blk}.{names[sub]}.{leaf}'
    raise ValueError(f'unrecognized pycls key {key}')


def convert_state_dict(src):
    out = OrderedDict()
    for k, v in src.items():
        nk = convert_key(k)
        if nk is not None:
            out[nk] = v
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('src')
    p.add_argument('dst')
    args = p.parse_args(argv)
    import torch
    blob = torch.load(args.src, map_location='cpu', weights_only=False)
    src = blob.get('model_state', blob) if isinstance(blob, dict) else blob
    torch.save(dict(state_dict=convert_state_dict(src)), args.dst)
    print(f'converted {len(src)} keys -> {args.dst}')


if __name__ == '__main__':
    sys.exit(main())
