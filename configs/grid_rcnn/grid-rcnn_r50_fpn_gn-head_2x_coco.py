# Grid R-CNN (reference configs/grid_rcnn/grid-rcnn_r50_fpn_gn-head_2x).
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
model = dict(type='GridRCNN')
