# Deformable DETR R50 (reference configs/deformable_detr/
# deformable-detr_r50_16xb2-50e_coco.py; AdamW 50e recipe).
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='DeformableDETR', num_classes=80, depth=50,
             num_queries=300, compute_dtype='bfloat16', frozen_stages=1,
             test_cfg=dict(max_per_img=100))
train_cfg = dict(epochs=50)
optim = dict(lr=2e-4, milestones_epochs=(40,))
