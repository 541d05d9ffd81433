# RetinaNet R101-FPN 2x (reference configs/retinanet/retinanet_r101_fpn_2x_coco.py).
_base_ = ['retinanet_r50_fpn_2x_coco.py']
model = dict(depth=101)
