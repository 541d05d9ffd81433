#!/usr/bin/env python
"""Convert a Detectron (caffe2) ResNet pickle into erd_tpu-importable form.

Counterpart of ``reference/tools/model_converters/detectron2pytorch.py``
(:35-70): Detectron stores each conv as ``res{S}_{B}_branch2{a,b,c}_w`` and
each (affine-channel) "bn" as ``..._bn_{s,b}`` with no running stats. The
rename target is torchvision-style ``layer{i}.{j}.conv{k}/bn{k}`` keys with
zero running_mean / unit running_var — exactly what
``erd_tpu.models.weight_import.load_torchvision_resnet`` consumes (erd_tpu's
FrozenBatchNorm folds (scale, bias, mean, var) the same way mmdet's
frozen-BN caffe backbones do).

No caffe2 dependency: the pickle is read with the stdlib (numpy payloads).

Usage:
    python tools/model_converters/detectron2erd.py in.pkl out.pth 50
"""
import argparse
import pickle
import sys
from collections import OrderedDict

import numpy as np

ARCH = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


def _bn(blobs, out, caffe, torch_name, seen):
    scale = np.asarray(blobs[caffe + '_s'])
    out[torch_name + '.weight'] = scale
    out[torch_name + '.bias'] = np.asarray(blobs[caffe + '_b'])
    out[torch_name + '.running_mean'] = np.zeros_like(scale)
    out[torch_name + '.running_var'] = np.ones_like(scale)
    seen.update({caffe + '_s', caffe + '_b'})


def _conv(blobs, out, caffe, torch_name, seen):
    out[torch_name + '.weight'] = np.asarray(blobs[caffe + '_w'])
    seen.add(caffe + '_w')
    if caffe + '_b' in blobs:
        out[torch_name + '.bias'] = np.asarray(blobs[caffe + '_b'])
        seen.add(caffe + '_b')


def convert_blobs(blobs, depth):
    if depth not in ARCH:
        raise ValueError('only ResNet-50/101 Detectron pickles')
    out, seen = OrderedDict(), set()
    _conv(blobs, out, 'conv1', 'conv1', seen)
    _bn(blobs, out, 'res_conv1_bn', 'bn1', seen)
    for i, n_blocks in enumerate(ARCH[depth], start=1):
        for j in range(n_blocks):
            if j == 0:
                _conv(blobs, out, f'res{i + 1}_{j}_branch1',
                      f'layer{i}.{j}.downsample.0', seen)
                _bn(blobs, out, f'res{i + 1}_{j}_branch1_bn',
                    f'layer{i}.{j}.downsample.1', seen)
            for k, letter in enumerate('abc'):
                _conv(blobs, out, f'res{i + 1}_{j}_branch2{letter}',
                      f'layer{i}.{j}.conv{k + 1}', seen)
                _bn(blobs, out, f'res{i + 1}_{j}_branch2{letter}_bn',
                    f'layer{i}.{j}.bn{k + 1}', seen)
    skipped = [k for k in blobs if k not in seen]
    return out, skipped


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('src')
    p.add_argument('dst')
    p.add_argument('depth', type=int)
    args = p.parse_args(argv)
    with open(args.src, 'rb') as f:
        blob = pickle.load(f, encoding='latin1')
    blobs = blob['blobs'] if 'blobs' in blob else blob
    out, skipped = convert_blobs(blobs, args.depth)
    for k in skipped:
        print(f'not converted: {k}')
    import torch
    torch.save(dict(state_dict={k: torch.from_numpy(np.ascontiguousarray(v))
                                for k, v in out.items()}), args.dst)
    print(f'converted {len(out)} keys -> {args.dst}')


if __name__ == '__main__':
    sys.exit(main())
