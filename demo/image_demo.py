#!/usr/bin/env python
"""Single-image inference demo (reference demo/image_demo.py analogue).

Usage:
    python demo/image_demo.py demo.jpg configs/gfl/gfl_r50_fpn_1x_coco.py \
        --weights work_dirs/gfl/step_87960 --out-dir outputs/
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('img')
    p.add_argument('config')
    p.add_argument('--weights', default=None)
    p.add_argument('--out-dir', default='outputs')
    p.add_argument('--score-thr', type=float, default=0.3)
    args = p.parse_args()

    from erd_tpu.apis import DetInferencer
    inferencer = DetInferencer(args.config, weights=args.weights)
    result = inferencer(args.img, out_dir=args.out_dir,
                        pred_score_thr=args.score_thr)
    preds = result['predictions']
    print(f"{len(preds['scores'])} detections "
          f"(>= {args.score_thr}: "
          f"{sum(s >= args.score_thr for s in preds['scores'])}); "
          f"visualization in {args.out_dir}/")


if __name__ == '__main__':
    main()
