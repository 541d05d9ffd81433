# GFL R101-FPN ms-2x: published 44.7 AP (reference
# configs/gfl/gfl_r101_fpn_ms-2x_coco.py, README.md:21).
_base_ = ['gfl_r50_fpn_ms2x_coco.py']
model = dict(depth=101)
