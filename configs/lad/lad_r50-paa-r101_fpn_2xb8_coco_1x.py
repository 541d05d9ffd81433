# LAD (reference configs/lad/lad_r50-paa-r101_fpn_2xb8_coco_1x.py).
_base_ = '../paa/paa_r50_fpn_1x_coco.py'
model = dict(type='LAD')
