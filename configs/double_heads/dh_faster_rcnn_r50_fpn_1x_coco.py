# Double-Head R-CNN (reference
# configs/double_heads/dh-faster-rcnn_r50_fpn_1x_coco.py): conv branch
# regression on 1.3x-scaled RoIs, fc branch classification, both
# losses weighted 2.0.
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
model = dict(type='DoubleHeadRCNN')
