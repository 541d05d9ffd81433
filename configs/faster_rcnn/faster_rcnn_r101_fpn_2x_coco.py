# Faster R-CNN R101-FPN 2x (reference configs/faster_rcnn/faster-rcnn_r101_fpn_2x_coco.py).
_base_ = ['faster_rcnn_r50_fpn_2x_coco.py']
model = dict(depth=101)
