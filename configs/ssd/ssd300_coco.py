# SSD300 (reference configs/ssd/ssd300_coco.py). Canonical train pipeline:
# PhotoMetricDistortion -> Expand(mean) -> MinIoURandomCrop -> Resize(300)
# -> RandomFlip (coco_detection base there).
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='SSD', num_classes=80, input_size=300,
             compute_dtype='bfloat16', frozen_stages=-1,
             test_cfg=dict(score_thr=0.02, nms_iou_threshold=0.45,
                           max_per_img=200))
train_dataloader = dict(batch_size=64,
                        pipeline=dict(
                            scale=(300, 300),
                            strong_aug=[
                                dict(type='PhotoMetricDistortion'),
                                dict(type='Expand',
                                     mean=(123.675, 116.28, 103.53)),
                                dict(type='MinIoURandomCrop'),
                            ]))
val_dataloader = dict(pipeline=dict(scale=(300, 300)))
test_dataloader = val_dataloader
optim = dict(lr=2e-3, milestones_epochs=(16, 22))
train_cfg = dict(epochs=24)
