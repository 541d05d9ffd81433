# YOLOF R50-C5 1x (reference configs/yolof/yolof_r50-c5_8xb8-1x_coco.py).
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='YOLOF', num_classes=80, depth=50,
             compute_dtype='bfloat16', frozen_stages=1,
             train_cfg=dict(match_times=4, pos_ignore_thr=0.15,
                            neg_ignore_thr=0.7),
             test_cfg=dict(score_thr=0.05, nms_pre=1000,
                           nms_iou_threshold=0.6, max_per_img=100))
train_dataloader = dict(batch_size=8)
# reference: SGD lr=0.12, backbone lr_mult 1/3, 1500-iter warmup 0.00066667
optim_wrapper = dict(optimizer=dict(lr=0.12),
                     paramwise_cfg=dict(backbone_lr_mult=1.0 / 3))
