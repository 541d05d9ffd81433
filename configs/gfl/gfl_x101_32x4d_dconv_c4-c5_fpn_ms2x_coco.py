# GFL X101-32x4d + deformable conv C4-C5, ms-2x: published 48.1 AP
# (reference configs/gfl/gfl_x101-32x4d-dconv-c4-c5_fpn_ms-2x_coco.py;
# dcn type='DCN' in the file — see the r101-dconv config note).
_base_ = ['gfl_r50_fpn_ms2x_coco.py']
model = dict(backbone=dict(type='ResNeXt', depth=101, groups=32,
                           base_width=4,
                           dcn_stages=(False, False, True, True),
                           dcn_modulated=False))
