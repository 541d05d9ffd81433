# SCNet (reference configs/scnet/scnet_r50_fpn_1x_coco.py).
_base_ = '../htc/htc_r50_fpn_1x_coco.py'
model = dict(type='SCNet')
