# FSAF R50-FPN 1x (reference configs/fsaf/fsaf_r50_fpn_1x_coco.py).
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='FSAF', num_classes=80, depth=50,
             compute_dtype='bfloat16', frozen_stages=1,
             train_cfg=dict(pos_scale=0.2, neg_scale=0.2, min_pos_iof=0.01),
             test_cfg=dict(score_thr=0.05, nms_pre=1000,
                           nms_iou_threshold=0.5, max_per_img=100))
optim_wrapper = dict(clip_grad=dict(max_norm=10, norm_type=2))
