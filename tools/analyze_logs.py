#!/usr/bin/env python
"""Analyze training json logs: average iter time / plot loss curves
(reference tools/analysis_tools/analyze_logs.py analogue; logs come from
LoggerHook(json_path=...))."""
import argparse
import json
import sys


def load(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest='task', required=True)
    t = sub.add_parser('cal_train_time')
    t.add_argument('json_logs', nargs='+')
    pl = sub.add_parser('plot_curve')
    pl.add_argument('json_logs', nargs='+')
    pl.add_argument('--keys', nargs='+', default=['loss_cls'])
    pl.add_argument('--out', default='curve.png')
    args = p.parse_args()

    if args.task == 'cal_train_time':
        for path in args.json_logs:
            rows = load(path)
            times = [r['iter_time'] for r in rows if 'iter_time' in r]
            if not times:
                print(f'{path}: no timing rows')
                continue
            import numpy as np
            print(f'{path}: mean {np.mean(times) * 1000:.1f} ms/iter, '
                  f'fastest {min(times) * 1000:.1f}, '
                  f'slowest {max(times) * 1000:.1f}, '
                  f'throughput {np.mean([r["images_per_sec"] for r in rows if "images_per_sec" in r]):.1f} img/s')
    else:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        for path in args.json_logs:
            rows = load(path)
            for key in args.keys:
                xs = [r['step'] for r in rows if key in r]
                ys = [r[key] for r in rows if key in r]
                plt.plot(xs, ys, label=f'{path}:{key}')
        plt.legend()
        plt.xlabel('iter')
        plt.savefig(args.out)
        print(f'saved {args.out}')


if __name__ == '__main__':
    main()
