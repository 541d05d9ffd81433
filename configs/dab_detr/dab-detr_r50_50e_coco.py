# DAB-DETR R50 (reference configs/dab_detr/dab-detr_r50_8xb2-50e_coco.py)
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='DABDETR', num_classes=80, depth=50, num_queries=300,
             compute_dtype='bfloat16')
optim = dict(lr=1e-4, weight_decay=1e-4, milestones_epochs=(40,))
train_cfg = dict(epochs=50)
