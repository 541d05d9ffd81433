# DETR R50 (reference configs/detr/detr_r50_8xb2-150e_coco.py; AdamW 150e
# recipe in the reference — optimizer settings here follow the shared
# schedule config and can be overridden).
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='DETR', num_classes=80, depth=50, num_queries=100,
             compute_dtype='bfloat16', frozen_stages=1,
             test_cfg=dict(max_per_img=100))
train_cfg = dict(epochs=150)
optim = dict(lr=0.0001, milestones_epochs=(100,))
