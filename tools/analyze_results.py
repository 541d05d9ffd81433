"""Rank images by per-image AP and render the best/worst.

Mirror of /root/reference/tools/analysis_tools/analyze_results.py: load a
DumpDetResults pickle, score every image with a single-IoU AP, save the
``--topk`` best and worst visualizations under good/ and bad/.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import argparse
import os

from erd_tpu.apis.build import build_dataset
from erd_tpu.config import Config
from erd_tpu.evaluation.analysis import load_dump, per_image_scores


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('prediction_pkl')
    p.add_argument('show_dir')
    p.add_argument('--topk', type=int, default=20)
    p.add_argument('--show-score-thr', type=float, default=0.3)
    args = p.parse_args()

    cfg = Config.fromfile(args.config)
    dataset = build_dataset(cfg, cfg.test_dataloader,
                            cfg.get('data_root', ''), test_mode=True)
    results = load_dump(args.prediction_pkl)
    scores = per_image_scores(results, dataset)
    ranked = sorted(scores.items(), key=lambda kv: kv[1])
    os.makedirs(os.path.join(args.show_dir, 'good'), exist_ok=True)
    os.makedirs(os.path.join(args.show_dir, 'bad'), exist_ok=True)

    by_id = {r['img_id']: r for r in results}
    rec_by_id = {rec.img_id: rec for rec in dataset}

    def render(img_id, sub):
        from erd_tpu.data.transforms import imread_rgb
        from erd_tpu.visualization import draw_detections
        rec = rec_by_id[img_id]
        res = by_id[img_id]
        try:
            img = imread_rgb(rec.path)
        except Exception:
            return
        keep = res['scores'] >= args.show_score_thr
        out = draw_detections(img, res['bboxes'][keep],
                              res['scores'][keep], res['labels'][keep],
                              class_names=dataset.label_names)
        from PIL import Image
        Image.fromarray(out).save(os.path.join(
            args.show_dir, sub, f'{img_id}_{scores[img_id]:.3f}.jpg'))

    for img_id, _ in ranked[:args.topk]:
        render(img_id, 'bad')
    for img_id, _ in ranked[-args.topk:]:
        render(img_id, 'good')
    print(f'wrote visualizations for {min(args.topk, len(ranked))} '
          f'best/worst images under {args.show_dir}')


if __name__ == '__main__':
    main()
