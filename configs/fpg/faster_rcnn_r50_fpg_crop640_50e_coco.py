# Feature Pyramid Grids: 9 stacked fully-connected pyramid pathways
# (reference configs/fpg/faster-rcnn_r50_fpg_crop640-50e_coco.py:
# 640x640 crops, 50 epochs, SGD 0.08).
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
model = dict(neck=dict(type='FPG', out_channels=256, inter_channels=256,
                       num_outs=5, stack_times=9))
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
