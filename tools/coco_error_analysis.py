"""Per-class COCO error decomposition from dumped predictions.

Mirror of /root/reference/tools/analysis_tools/coco_error_analysis.py:
for each class report the progressive APs C75 / C50 / Loc / Oth / BG / FN
(strict -> every error type forgiven), which decompose the gap between
AP@0.75 and perfect recall into localization, class-confusion, background
false-positive and missed-detection contributions.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import argparse
import json

from erd_tpu.apis.build import build_dataset
from erd_tpu.config import Config
from erd_tpu.evaluation.analysis import coco_error_analysis, load_dump


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('prediction_pkl')
    p.add_argument('--out', help='save the per-class table as .json')
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    dataset = build_dataset(cfg, cfg.test_dataloader,
                            cfg.get('data_root', ''), test_mode=True)
    results = load_dump(args.prediction_pkl)
    names = list(dataset.label_names)
    table = coco_error_analysis(results, dataset, len(names))
    cols = ('C75', 'C50', 'Loc', 'Oth', 'BG', 'FN')
    width = max([len(n) for n in names] + [6]) + 2
    print(' ' * width + ''.join(f'{c:>8}' for c in cols))
    for c, row in table.items():
        name = 'mean' if c == 'mean' else names[c]
        print(f'{name:<{width}}' +
              ''.join(f'{row[k]:8.3f}' for k in cols))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump({('mean' if c == 'mean' else names[c]): row
                       for c, row in table.items()}, f, indent=2)
        print(f'saved to {args.out}')


if __name__ == '__main__':
    main()
