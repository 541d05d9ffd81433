#!/usr/bin/env python
"""Evaluation launcher (reference tools/test.py analogue)."""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def parse_args():
    p = argparse.ArgumentParser(description='Evaluate a detector')
    p.add_argument('config')
    p.add_argument('checkpoint')
    p.add_argument('--cfg-options', nargs='+', default=[])
    p.add_argument('--classwise', action='store_true',
                   help='print per-category AP table')
    p.add_argument('--out-prefix', default=None,
                   help='dump COCO-format bbox json to <prefix>.bbox.json')
    p.add_argument('--out-pkl', default=None,
                   help='also dump raw predictions to a pickle '
                        '(DumpDetResults analogue)')
    p.add_argument('--max-batches', type=int, default=None)
    p.add_argument('--tta', action='store_true',
                   help='flip test-time augmentation')
    p.add_argument('--tta-scales', type=float, nargs='+', default=None,
                   help='multi-scale TTA factors, e.g. 0.75 1.0 1.25 '
                        '(implies --tta flip merge per scale)')
    return p.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO,
                        format='%(asctime)s %(levelname)s %(message)s')
    from erd_tpu.apis import (build_dataset, build_loader, build_metric,
                              init_detector)
    from erd_tpu.config import Config, parse_cfg_options
    from erd_tpu.engine import run_evaluation
    from erd_tpu.evaluation import CocoMetric

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(parse_cfg_options(args.cfg_options),
                           strict=True)

    detector, variables, _ = init_detector(cfg, args.checkpoint)
    data_root = cfg.get('data_root', '')
    loader_cfg = cfg.get('test_dataloader', cfg.val_dataloader)
    ds = build_dataset(cfg, loader_cfg, data_root, test_mode=True)
    loader = build_loader(ds, loader_cfg, training=False)
    ev_cfg = dict(cfg.get('test_evaluator', cfg.get('val_evaluator', {})))
    if args.classwise:
        ev_cfg['classwise'] = True
    if args.out_prefix:
        ev_cfg['outfile_prefix'] = args.out_prefix
    metric_cls = CocoMetric
    if ev_cfg.get('type') == 'LVISMetric':
        from erd_tpu.evaluation import LVISMetric
        metric_cls = LVISMetric
    metric = metric_cls(ds, classwise=ev_cfg.get('classwise', False),
                        outfile_prefix=ev_cfg.get('outfile_prefix'))

    predict_fn = None
    if args.tta or args.tta_scales:
        from erd_tpu.models.tta import tta_predict_multiscale
        scales = tuple(args.tta_scales or (1.0,))
        logging.info(f'TTA on: scales={scales} + hflip')

        def predict_fn(variables, batch):
            return tta_predict_multiscale(detector, variables, batch,
                                          scales=scales, flip=True)

    metrics = run_evaluation(detector, variables, loader, metric,
                             max_batches=args.max_batches,
                             predict_fn=predict_fn)
    if args.out_pkl:
        from erd_tpu.evaluation import DumpDetResults
        dump = DumpDetResults(args.out_pkl)
        run_evaluation(detector, variables, loader, dump,
                       max_batches=args.max_batches, predict_fn=predict_fn)
        logging.info(f'raw predictions dumped to {args.out_pkl}')
    for k, v in metrics.items():
        if isinstance(v, float):
            logging.info(f'{k}: {v:.4f}')
    if 'classwise_table' in metrics:
        print(metrics['classwise_table'])


if __name__ == '__main__':
    main()
