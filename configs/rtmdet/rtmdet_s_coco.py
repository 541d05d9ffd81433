# RTMDet-s (reference configs/rtmdet/rtmdet_s_8xb32-300e_coco.py).
# Canonical strong-aug pipeline: CachedMosaic -> RandomCrop ->
# YOLOXHSVRandomAug -> CachedMixUp, switched to weak augs for the last
# 20 epochs; AdamW + cosine annealing from the half-way point.
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='RTMDet', num_classes=80, compute_dtype='bfloat16',
             frozen_stages=-1,
             test_cfg=dict(score_thr=0.001, nms_iou_threshold=0.65,
                           max_per_img=300))
train_dataloader = dict(pipeline=dict(
    scale=(640, 640),
    strong_aug=[
        dict(type='CachedMosaic', img_scale=(640, 640), pad_val=114,
             max_cached_images=40),
        dict(type='RandomCrop', crop_size=(640, 640)),
        dict(type='YOLOXHSVRandomAug'),
        dict(type='CachedMixUp', img_scale=(640, 640),
             ratio_range=(1.0, 1.0), max_cached_images=20, prob=0.5),
    ]))
val_dataloader = dict(pipeline=dict(scale=(640, 640)))
test_dataloader = val_dataloader
train_cfg = dict(epochs=300)
# reference: AdamW 0.004 / wd 0.05, LinearLR 1000 iters, flat to epoch
# 150, CosineAnnealing 150->300 to lr*0.05
optim = dict(type='AdamW', lr=0.004, weight_decay=0.05,
             schedule='cosine', warmup_iters=1000, warmup_factor=1e-5,
             cosine_begin_epoch=150, cosine_end_epoch=300,
             min_lr_ratio=0.05)
custom_hooks = [
    dict(type='PipelineSwitchHook', switch_epoch=280,
         pipeline=dict(scale=(640, 640), flip_prob=0.5)),
]
