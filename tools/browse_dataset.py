"""Visualize the training pipeline's outputs.

Mirror of /root/reference/tools/analysis_tools/browse_dataset.py: iterate
the config's train dataset, draw the gt boxes on each (pipeline-processed)
image and save/show them.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import argparse
import os

import numpy as np

from erd_tpu.apis.build import build_dataset
from erd_tpu.config import Config


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--output-dir', default='work_dirs/browse')
    p.add_argument('--max-images', type=int, default=20)
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    dataset = build_dataset(cfg, cfg.train_dataloader,
                            cfg.get('data_root', ''))
    os.makedirs(args.output_dir, exist_ok=True)
    from erd_tpu.data.transforms import imread_rgb
    from erd_tpu.visualization import draw_detections
    from PIL import Image
    n = 0
    for rec in dataset:
        try:
            img = imread_rgb(rec.path)
        except Exception:
            continue
        keep = ~rec.ignore
        out = draw_detections(img, rec.bboxes[keep], None,
                              rec.labels[keep],
                              class_names=dataset.label_names)
        Image.fromarray(out).save(
            os.path.join(args.output_dir, f'{rec.img_id}.jpg'))
        n += 1
        if n >= args.max_images:
            break
    print(f'wrote {n} annotated images to {args.output_dir}')


if __name__ == '__main__':
    main()
