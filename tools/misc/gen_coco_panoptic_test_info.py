#!/usr/bin/env python
"""Generate COCO panoptic test-dev image info json.

Counterpart of /root/reference/tools/misc/gen_coco_panoptic_test_info.py:
grafts the panoptic categories (which carry `isthing`) from
panoptic_val2017.json onto image_info_test-dev2017.json so the panoptic
pipeline can run on the annotation-free test-dev split.
"""
import argparse
import json
import os.path as osp


def main():
    p = argparse.ArgumentParser()
    p.add_argument('data_root', help='COCO annotation directory')
    args = p.parse_args()
    with open(osp.join(args.data_root, 'panoptic_val2017.json')) as f:
        val_info = json.load(f)
    with open(osp.join(args.data_root,
                       'image_info_test-dev2017.json')) as f:
        test_info = json.load(f)
    test_info['categories'] = val_info['categories']
    out = osp.join(args.data_root,
                   'panoptic_image_info_test-dev2017.json')
    with open(out, 'w') as f:
        json.dump(test_info, f)
    print(f'wrote {out}')


if __name__ == '__main__':
    main()
