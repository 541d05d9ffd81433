# RTMDet-s (reference configs/rtmdet/rtmdet_s_8xb32-300e_coco.py).
# Canonical strong-aug pipeline: CachedMosaic -> RandomCrop ->
# YOLOXHSVRandomAug -> CachedMixUp (cache is a worker-locality detail; the
# math is Mosaic/MixUp), switched to weak augs for the last 20 epochs.
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
        dict(type='Mosaic', img_scale=(640, 640), pad_val=114),
        dict(type='RandomCrop', crop_size=(640, 640)),
        dict(type='YOLOXHSVRandomAug'),
        dict(type='MixUp', img_scale=(640, 640), ratio_range=(1.0, 1.0)),
    ]))
val_dataloader = dict(pipeline=dict(scale=(640, 640)))
test_dataloader = val_dataloader
train_cfg = dict(epochs=300)
custom_hooks = [
    dict(type='PipelineSwitchHook', switch_epoch=280,
         pipeline=dict(scale=(640, 640), flip_prob=0.5)),
]
