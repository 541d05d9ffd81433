# RTMDet-Ins-tiny (reference configs/rtmdet/rtmdet-ins_tiny_8xb32-300e_coco.py):
# deepen 0.167 / widen 0.375 over the -Ins-s recipe (reduced mosaic/mixup
# caches as in rtmdet_tiny).
_base_ = ['rtmdet_ins_s_coco.py']
model = dict(deepen=0.167, widen=0.375)
train_dataloader = dict(pipeline=dict(
    scale=(640, 640),
    strong_aug=[
        dict(type='CachedMosaic', img_scale=(640, 640), pad_val=114,
             max_cached_images=20, prob=0.5),
        dict(type='RandomCrop', crop_size=(640, 640)),
        dict(type='YOLOXHSVRandomAug'),
        dict(type='CachedMixUp', img_scale=(640, 640),
             ratio_range=(1.0, 1.0), max_cached_images=10, prob=0.5),
    ]))
