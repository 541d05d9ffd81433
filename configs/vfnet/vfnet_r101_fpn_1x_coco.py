# VFNet R101-FPN 1x (reference configs/vfnet/vfnet_r101_fpn_1x_coco.py).
_base_ = ['vfnet_r50_fpn_1x_coco.py']
model = dict(depth=101)
