# PAA R101-FPN 2x (reference configs/paa/paa_r101_fpn_2x_coco.py).
_base_ = ['paa_r50_fpn_2x_coco.py']
model = dict(depth=101)
