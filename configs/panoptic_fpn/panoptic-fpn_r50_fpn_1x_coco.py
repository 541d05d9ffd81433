# PanopticFPN (reference configs/panoptic_fpn/panoptic-fpn_r50_fpn_1x_coco).
_base_ = [
    '../_base_/datasets/coco_instance.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='PanopticFPN', num_classes=80, depth=50,
             num_stuff_classes=53, compute_dtype='bfloat16',
             frozen_stages=1,
             test_cfg=dict(score_thr=0.05, nms_iou_threshold=0.5,
                           max_per_img=100))
