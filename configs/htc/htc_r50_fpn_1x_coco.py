# HTC (reference configs/htc/htc_r50_fpn_1x_coco.py).
_base_ = [
    '../_base_/datasets/coco_instance.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='HTC', num_classes=80, depth=50, semantic_classes=183,
             compute_dtype='bfloat16', frozen_stages=1,
             test_cfg=dict(score_thr=0.001, nms_iou_threshold=0.5,
                           max_per_img=100))
