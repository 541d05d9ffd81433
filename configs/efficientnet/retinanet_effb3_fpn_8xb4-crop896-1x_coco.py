# RetinaNet + EfficientNet-B3 backbone, 896x896 crops
# (reference configs/efficientnet/retinanet_effb3_fpn_8xb4-crop896-1x_coco.py:
# out levels at strides 8/16/32 -> in_channels [48, 136, 384], FPN from
# level 0 with extras on_input + relu_before_extra_convs, RetinaSepBNHead,
# train-time BN everywhere).
_base_ = '../retinanet/retinanet_r50_fpn_1x_coco.py'
model = dict(
    head='RetinaSepBNHead',
    backbone=dict(type='EfficientNet', arch='b3', out_indices=(2, 4, 6)),
    neck=dict(type='FPN', start_level=0, out_channels=256, num_outs=5,
              add_extra_convs='on_input', relu_before_extra_convs=True))
train_dataloader = dict(
    batch_size=8,
    pipeline=dict(
        scale=(896, 896),
        strong_aug=[
            dict(type='RandomRatioResize', scale=(896, 896),
                 ratio_range=(0.8, 1.2)),
            dict(type='RandomCrop', crop_size=(896, 896)),
        ]))
val_dataloader = dict(pipeline=dict(scale=(896, 896)))
test_dataloader = val_dataloader
optim = dict(lr=0.04, warmup_iters=1000, warmup_factor=0.1)
auto_scale_lr = dict(enable=True, base_batch_size=32)
