# CrowdDet (reference configs/crowddet/crowddet-rcnn_r50_fpn_8xb2-30e).
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
model = dict(type='CrowdDet', num_classes=1)
