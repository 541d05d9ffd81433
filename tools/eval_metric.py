"""Offline re-evaluation of dumped predictions.

Mirror of /root/reference/tools/analysis_tools/eval_metric.py: evaluate a
DumpDetResults pickle against the config's test dataset without rerunning
the model.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import argparse
import logging

from erd_tpu.apis.build import build_dataset
from erd_tpu.config import Config
from erd_tpu.evaluation.analysis import eval_dumped

logging.basicConfig(level=logging.INFO, format='%(message)s')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('pkl_results')
    p.add_argument('--classwise', action='store_true')
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    dataset = build_dataset(cfg, cfg.test_dataloader,
                            cfg.get('data_root', ''), test_mode=True)
    metrics = eval_dumped(args.pkl_results, dataset,
                          len(dataset.label_names),
                          classwise=args.classwise)
    for k, v in metrics.items():
        logging.info('%s: %.4f', k, v)


if __name__ == '__main__':
    main()
