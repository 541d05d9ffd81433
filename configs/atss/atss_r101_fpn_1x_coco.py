# ATSS R101-FPN 1x (reference configs/atss/atss_r101_fpn_1x_coco.py).
_base_ = ['atss_r50_fpn_1x_coco.py']
model = dict(depth=101)
