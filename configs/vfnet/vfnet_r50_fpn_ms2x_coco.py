# VFNet R50-FPN multi-scale 2x (reference
# configs/vfnet/vfnet_r50_fpn_ms-2x_coco.py): 24 epochs, milestones
# [16, 22], random train scales 480..960 short side.
_base_ = ['vfnet_r50_fpn_1x_coco.py']
train_cfg = dict(epochs=24)
optim = dict(milestones_epochs=(16, 22))
train_dataloader = dict(
    pipeline=dict(
        scale=(1333, 800),
        ms_scales=((1333, 480), (1333, 600), (1333, 720), (1333, 840),
                   (1333, 960)),
    ))
