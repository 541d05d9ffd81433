#!/usr/bin/env python
"""Benchmark CLI (reference tools/analysis_tools/benchmark.py analogue):
inference fps, dataloader throughput, or raw dataset pipeline speed."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--task', choices=['inference', 'dataloader', 'dataset'],
                   default='inference')
    p.add_argument('--batch-size', type=int, default=1)
    p.add_argument('--max-iter', type=int, default=50)
    args = p.parse_args()

    from erd_tpu.apis import build_dataset, build_loader, init_detector
    from erd_tpu.config import Config
    from erd_tpu.utils import (DataLoaderBenchmark, DatasetBenchmark,
                               InferenceBenchmark)

    cfg = Config.fromfile(args.config)
    if args.task == 'inference':
        import numpy as np

        from __graft_entry__ import _make_batch
        det, variables, _ = init_detector(cfg, args.checkpoint)
        batch = _make_batch(det, args.batch_size, 800, 1344)
        res = InferenceBenchmark(det, variables, batch,
                                 max_iter=args.max_iter).run()
    else:
        loader_cfg = cfg.val_dataloader
        ds = build_dataset(cfg, loader_cfg, cfg.get('data_root', ''),
                           test_mode=True)
        loader = build_loader(ds, loader_cfg, training=False)
        if args.task == 'dataloader':
            res = DataLoaderBenchmark(loader, max_iter=args.max_iter).run()
        else:
            res = DatasetBenchmark(ds, loader.pipeline,
                                   max_iter=args.max_iter).run()
    print(json.dumps({'task': args.task, **res.as_dict()}))


if __name__ == '__main__':
    main()
