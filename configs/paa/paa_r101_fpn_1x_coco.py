# PAA R101-FPN 1x (reference configs/paa/paa_r101_fpn_1x_coco.py).
_base_ = ['paa_r50_fpn_1x_coco.py']
model = dict(depth=101)
