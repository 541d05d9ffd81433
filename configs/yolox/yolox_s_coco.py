# YOLOX-s (reference configs/yolox/yolox_s_8xb8-300e_coco.py; SGD+EMA 300e
# recipe there; schedule overridable).
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='YOLOX', num_classes=80, compute_dtype='bfloat16',
             frozen_stages=-1,
             test_cfg=dict(score_thr=0.01, nms_iou_threshold=0.65,
                           max_per_img=100))
train_dataloader = dict(pipeline=dict(scale=(640, 640)))
val_dataloader = dict(pipeline=dict(scale=(640, 640)))
test_dataloader = val_dataloader
