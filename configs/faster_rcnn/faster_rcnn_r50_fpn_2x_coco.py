# Faster R-CNN R50-FPN 2x (reference configs/faster_rcnn/faster-rcnn_r50_fpn_2x_coco.py).
_base_ = ['faster_rcnn_r50_fpn_1x_coco.py', '../_base_/schedules/schedule_2x.py']
