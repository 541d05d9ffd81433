# GRoIE (reference configs/groie/faste-rcnn_r50_fpn_groie_1x_coco.py).
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
model = dict(type='GRoIEFasterRCNN')
