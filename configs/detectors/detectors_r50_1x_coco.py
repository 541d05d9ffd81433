# DetectoRS (reference configs/detectors/detectors_*_r50_1x_coco.py).
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
model = dict(type='DetectoRS')
