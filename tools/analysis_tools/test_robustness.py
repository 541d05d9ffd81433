#!/usr/bin/env python
"""Corruption-robustness benchmark (reference tools/analysis_tools/
test_robustness.py + robustness_eval.py in one).

Evaluates a checkpoint on the clean test set and on each
(corruption, severity) variant — the corruption is applied to the decoded
RGB image before the resize pipeline, exactly where the reference inserts
its `Corrupt` transform — then prints the benchmark aggregates:

    P      clean performance (severity 0)
    mPC    mean performance under corruption (severities 1..5, all
           corruptions)
    rPC    relative: mPC / P

Usage:
    python tools/analysis_tools/test_robustness.py CONFIG CHECKPOINT \
        [--corruptions benchmark|noise|blur|weather|digital|<names...>] \
        [--severities 0 1 2 3 4 5] [--max-batches N] [--out out.json]
"""
import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

GROUPS = {  # reference tools/analysis_tools/test_robustness.py groups
    'noise': ('gaussian_noise', 'shot_noise', 'impulse_noise'),
    'blur': ('defocus_blur', 'glass_blur', 'motion_blur', 'zoom_blur'),
    'weather': ('snow', 'frost', 'fog', 'brightness'),
    'digital': ('contrast', 'elastic_transform', 'pixelate',
                'jpeg_compression'),
}


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint')
    p.add_argument('--corruptions', nargs='+', default=['benchmark'])
    p.add_argument('--severities', type=int, nargs='+',
                   default=[0, 1, 2, 3, 4, 5])
    p.add_argument('--metric-key', default='bbox_mAP')
    p.add_argument('--max-batches', type=int, default=None)
    p.add_argument('--out', default=None)
    p.add_argument('--cfg-options', nargs='+', default=[])
    return p.parse_args()


def resolve_corruptions(names):
    from erd_tpu.data.corruptions import (BENCHMARK_CORRUPTIONS,
                                          CORRUPTIONS)
    out = []
    for n in names:
        if n == 'benchmark':
            out.extend(BENCHMARK_CORRUPTIONS)
        elif n == 'all':
            out.extend(CORRUPTIONS)
        elif n in GROUPS:
            out.extend(GROUPS[n])
        else:
            assert n in CORRUPTIONS, \
                f'unknown corruption {n}; pick from {sorted(CORRUPTIONS)}'
            out.append(n)
    return list(dict.fromkeys(out))


class CorruptPipeline:
    """Wraps a DetPipeline: decode -> corrupt -> normal pipeline."""

    def __init__(self, base, corruption, severity):
        self.base = base
        self.corruption = corruption
        self.severity = severity

    def __getattr__(self, k):
        return getattr(self.base, k)

    def __call__(self, record, rng=None, image=None):
        from erd_tpu.data.corruptions import corrupt
        from erd_tpu.data.transforms import imread_rgb
        img = image if image is not None else imread_rgb(record.path)
        if self.severity > 0:
            img = corrupt(img, self.corruption, self.severity,
                          seed=record.img_id)
        return self.base(record, rng, image=img)


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO, format='%(message)s')
    from erd_tpu.apis import (build_dataset, build_loader, build_metric,
                              init_detector)
    from erd_tpu.config import Config, parse_cfg_options

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(parse_cfg_options(args.cfg_options),
                           strict=True)
    detector, variables, _ = init_detector(cfg, args.checkpoint)
    data_root = cfg.get('data_root', '')
    loader_cfg = cfg.get('test_dataloader', cfg.val_dataloader)
    ds = build_dataset(cfg, loader_cfg, data_root, test_mode=True)

    from erd_tpu.engine import run_evaluation

    corruptions = resolve_corruptions(args.corruptions)
    results = {}
    clean_p = None
    for corruption in (['clean'] if 0 in args.severities else []) + \
            corruptions:
        sevs = [0] if corruption == 'clean' else \
            [s for s in args.severities if s > 0]
        for sev in sevs:
            loader = build_loader(ds, loader_cfg, training=False)
            if sev > 0:
                loader.pipeline = CorruptPipeline(loader.pipeline,
                                                  corruption, sev)
            metric = build_metric(ds, cfg.get('test_evaluator',
                                              cfg.get('val_evaluator',
                                                      {})))
            m = run_evaluation(detector, variables, loader, metric,
                               max_batches=args.max_batches)
            val = float(m[args.metric_key])
            results.setdefault(corruption, {})[sev] = val
            logging.info(f'{corruption:20s} severity {sev}: '
                         f'{args.metric_key}={val:.4f}')
            if sev == 0:
                clean_p = val

    per_corruption = {c: sum(v for s, v in sv.items() if s > 0) /
                      max(len([s for s in sv if s > 0]), 1)
                      for c, sv in results.items() if c != 'clean'}
    mpc = sum(per_corruption.values()) / max(len(per_corruption), 1)
    summary = dict(P=clean_p, mPC=mpc,
                   rPC=(mpc / clean_p) if clean_p else None,
                   per_corruption=per_corruption, results=results)
    logging.info(f"\nP (clean) = {clean_p}\nmPC = {mpc:.4f}" +
                 (f"\nrPC = {summary['rPC']:.4f}" if clean_p else ''))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(summary, f, indent=2)
    return summary


if __name__ == '__main__':
    main()
