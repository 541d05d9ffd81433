# GFL X101-32x4d-FPN ms-2x: published 45.9 AP (reference
# configs/gfl/gfl_x101-32x4d_fpn_ms-2x_coco.py).
_base_ = ['gfl_r50_fpn_ms2x_coco.py']
model = dict(backbone=dict(type='ResNeXt', depth=101, groups=32,
                           base_width=4))
