# VFNet R101-FPN ms-2x (reference configs/vfnet/vfnet_r101_fpn_ms-2x_coco.py).
_base_ = ['vfnet_r50_fpn_ms2x_coco.py']
model = dict(depth=101)
