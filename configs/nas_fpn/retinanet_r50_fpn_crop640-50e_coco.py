# NAS-FPN baseline: RetinaNet + RetinaSepBNHead (shared convs, per-level
# BN), 640x640 crops, 50 epochs (reference
# configs/nas_fpn/retinanet_r50_fpn_crop640-50e_coco.py).
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='RetinaNet', num_classes=80, depth=50,
             head='RetinaSepBNHead', compute_dtype='bfloat16',
             test_cfg=dict(score_thr=0.05, nms_pre=1000,
                           nms_iou_threshold=0.5, max_per_img=100))
train_dataloader = dict(
    batch_size=8,
    pipeline=dict(
        scale=(640, 640),
        strong_aug=[
            dict(type='RandomRatioResize', scale=(640, 640),
                 ratio_range=(0.8, 1.2)),
            dict(type='RandomCrop', crop_size=(640, 640)),
        ]))
val_dataloader = dict(pipeline=dict(scale=(640, 640)))
test_dataloader = val_dataloader
train_cfg = dict(epochs=50)
optim = dict(lr=0.08, warmup_iters=1000, warmup_factor=0.1,
             milestones_epochs=(30, 40))
auto_scale_lr = dict(enable=True, base_batch_size=64)
