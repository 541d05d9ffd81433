# Mask R-CNN R50-FPN 2x (reference configs/mask_rcnn/mask-rcnn_r50_fpn_2x_coco.py).
_base_ = ['mask_rcnn_r50_fpn_1x_coco.py', '../_base_/schedules/schedule_2x.py']
