# DDOD R50-FPN 1x (reference configs/ddod/ddod_r50_fpn_1x_coco.py).
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='DDOD', num_classes=80, depth=50, use_dcn=True,
             compute_dtype='bfloat16', frozen_stages=1,
             test_cfg=dict(score_thr=0.05, nms_pre=1000,
                           nms_iou_threshold=0.6, max_per_img=100))
