#!/usr/bin/env python
"""COCO category splitter for incremental stages.

Re-implements the behavior of the reference's scripts/select_categories.py
(:21-65): sort categories by id, slice [first:last), keep annotations and
images of those categories, write ``*_sel_{first,last}_N_cats.json``.
"""
import argparse
import json
import os


def split(ann_file, start, end, out_file):
    with open(ann_file) as f:
        d = json.load(f)
    cats = sorted(d['categories'], key=lambda c: c['id'])[start:end]
    keep_ids = {c['id'] for c in cats}
    anns = [a for a in d['annotations'] if a['category_id'] in keep_ids]
    img_ids = {a['image_id'] for a in anns}
    imgs = [im for im in d['images'] if im['id'] in img_ids]
    out = dict(d)
    out['categories'] = cats
    out['annotations'] = anns
    out['images'] = imgs
    with open(out_file, 'w') as f:
        json.dump(out, f)
    print(f'{out_file}: {len(cats)} cats, {len(imgs)} imgs, '
          f'{len(anns)} anns')


def main():
    p = argparse.ArgumentParser()
    p.add_argument('ann_file')
    p.add_argument('--split-at', type=int, default=40,
                   help='boundary between first/last groups')
    p.add_argument('--total', type=int, default=80)
    p.add_argument('--out-dir', default=None)
    args = p.parse_args()
    base, ext = os.path.splitext(args.ann_file)
    if args.out_dir:
        base = os.path.join(args.out_dir,
                            os.path.basename(base))
    n_first = args.split_at
    n_last = args.total - args.split_at
    split(args.ann_file, 0, args.split_at,
          f'{base}_sel_first_{n_first}_cats{ext}')
    split(args.ann_file, args.split_at, args.total,
          f'{base}_sel_last_{n_last}_cats{ext}')


if __name__ == '__main__':
    main()
