# Faster R-CNN R101-FPN 1x (reference configs/faster_rcnn/faster-rcnn_r101_fpn_1x_coco.py).
_base_ = ['faster_rcnn_r50_fpn_1x_coco.py']
model = dict(depth=101)
