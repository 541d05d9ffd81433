# YOLOX-s (reference configs/yolox/yolox_s_8xb8-300e_coco.py; SGD+EMA 300e
# recipe there; schedule overridable). Canonical strong-aug train pipeline:
# Mosaic -> RandomAffine(border=-scale/2) -> MixUp -> YOLOXHSVRandomAug,
# switched off for the last 15 epochs via PipelineSwitchHook
# (reference yolox_mode_switch_hook.py / pipeline switching).
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='YOLOX', num_classes=80, compute_dtype='bfloat16',
             frozen_stages=-1,
             test_cfg=dict(score_thr=0.01, nms_iou_threshold=0.65,
                           max_per_img=100))
train_dataloader = dict(pipeline=dict(
    scale=(640, 640),
    strong_aug=[
        dict(type='Mosaic', img_scale=(640, 640)),
        dict(type='RandomAffine', scaling_ratio_range=(0.1, 2.0),
             border=(-320, -320)),
        dict(type='MixUp', img_scale=(640, 640), ratio_range=(0.8, 1.6)),
        dict(type='YOLOXHSVRandomAug'),
    ]))
val_dataloader = dict(pipeline=dict(scale=(640, 640)))
test_dataloader = val_dataloader
train_cfg = dict(epochs=300)
# reference: SGD 0.01 (per 8xb8), wd 5e-4, QuadraticWarmup 5 epochs,
# CosineAnnealing 5->285 to lr*0.05, flat for the last 15
optim = dict(lr=0.01, momentum=0.9, weight_decay=5e-4,
             schedule='cosine', quadratic_warmup=True, warmup_epochs=5,
             cosine_begin_epoch=5, cosine_end_epoch=285,
             min_lr_ratio=0.05)
auto_scale_lr = dict(enable=True, base_batch_size=64)
custom_hooks = [
    # strong augs off + raw-box L1 loss on for the last 15 epochs
    # (reference yolox_mode_switch_hook.py); the hook re-jits the
    # compiled train step so the L1 flag actually takes effect
    dict(type='YOLOXModeSwitchHook', max_epochs=300, num_last_epochs=15,
         pipeline=dict(scale=(640, 640), flip_prob=0.5)),
]
