# TOOD R101-FPN ms-2x (reference configs/tood/tood_r101_fpn_ms-2x_coco.py).
_base_ = ['tood_r50_fpn_ms2x_coco.py']
model = dict(depth=101)
