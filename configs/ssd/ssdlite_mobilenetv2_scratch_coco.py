# SSDLite MobileNetV2, trained from scratch (reference
# configs/ssd/ssdlite_mobilenetv2-scratch_8xb24-600e_coco.py): 320 input,
# depthwise head, 120 epochs (RepeatDataset x5 -> 600e equivalent),
# cosine LR from 0.015, weight decay 4e-5.
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='SSDLite', num_classes=80, input_size=320,
             compute_dtype='bfloat16', frozen_stages=-1,
             test_cfg=dict(score_thr=0.02, nms_iou_threshold=0.45,
                           max_per_img=200))
train_dataloader = dict(batch_size=24,
                        pipeline=dict(
                            scale=(320, 320),
                            strong_aug=[
                                dict(type='PhotoMetricDistortion'),
                                dict(type='Expand',
                                     mean=(123.675, 116.28, 103.53)),
                                dict(type='MinIoURandomCrop'),
                            ]))
val_dataloader = dict(pipeline=dict(scale=(320, 320)))
test_dataloader = val_dataloader
optim = dict(lr=0.015, weight_decay=4e-5, schedule='cosine',
             warmup_iters=500, warmup_factor=0.001,
             cosine_begin_epoch=0, cosine_end_epoch=120)
train_cfg = dict(epochs=120, val_interval=5)
auto_scale_lr = dict(enable=True, base_batch_size=192)
