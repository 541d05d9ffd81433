# DINO 4-scale R50 12e (reference configs/dino/dino-4scale_r50_8xb2-12e_coco.py)
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='DINO', num_classes=80, depth=50, num_queries=900,
             compute_dtype='bfloat16',
             test_cfg=dict(max_per_img=300))
optim = dict(lr=1e-4, weight_decay=1e-4, milestones_epochs=(11,))
