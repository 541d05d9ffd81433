"""Confusion matrix from dumped predictions.

Mirror of /root/reference/tools/analysis_tools/confusion_matrix.py:
consume a DumpDetResults pickle + the config's test dataset, print (and
optionally save) the (C+1)x(C+1) matrix with the background row/column.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import argparse

import numpy as np

from erd_tpu.apis.build import build_dataset
from erd_tpu.config import Config
from erd_tpu.evaluation.analysis import confusion_matrix, load_dump


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('prediction_pkl')
    p.add_argument('--score-thr', type=float, default=0.3)
    p.add_argument('--iou-thr', type=float, default=0.5)
    p.add_argument('--out', help='save the matrix as .npy')
    p.add_argument('--normalize', action='store_true',
                   help='row-normalize to percentages')
    args = p.parse_args()

    cfg = Config.fromfile(args.config)
    dataset = build_dataset(cfg, cfg.test_dataloader,
                            cfg.get('data_root', ''), test_mode=True)
    results = load_dump(args.prediction_pkl)
    num_classes = len(dataset.label_names)
    cm = confusion_matrix(results, dataset, num_classes,
                          score_thr=args.score_thr, iou_thr=args.iou_thr)
    if args.normalize:
        cm = cm / np.clip(cm.sum(axis=1, keepdims=True), 1, None) * 100
    names = list(dataset.label_names) + ['background']
    width = max(len(n) for n in names) + 2
    header = ' ' * width + ''.join(f'{n[:8]:>10}' for n in names)
    print(header)
    for i, n in enumerate(names):
        row = ''.join(f'{cm[i, j]:10.1f}' for j in range(len(names)))
        print(f'{n:<{width}}{row}')
    if args.out:
        np.save(args.out, cm)
        print(f'saved to {args.out}')


if __name__ == '__main__':
    main()
