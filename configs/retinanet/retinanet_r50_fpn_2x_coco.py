# RetinaNet R50-FPN 2x (reference configs/retinanet/retinanet_r50_fpn_2x_coco.py).
_base_ = ['retinanet_r50_fpn_1x_coco.py', '../_base_/schedules/schedule_2x.py']
