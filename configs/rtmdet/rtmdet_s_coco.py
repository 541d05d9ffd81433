# RTMDet-s (reference configs/rtmdet/rtmdet_s_8xb32-300e_coco.py; AdamW+EMA
# 300e recipe there).
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='RTMDet', num_classes=80, compute_dtype='bfloat16',
             frozen_stages=-1,
             test_cfg=dict(score_thr=0.05, nms_iou_threshold=0.65,
                           max_per_img=100))
train_dataloader = dict(pipeline=dict(scale=(640, 640)))
val_dataloader = dict(pipeline=dict(scale=(640, 640)))
test_dataloader = val_dataloader
