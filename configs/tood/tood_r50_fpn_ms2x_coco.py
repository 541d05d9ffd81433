# TOOD R50-FPN ms-2x (reference configs/tood/tood_r50_fpn_ms-2x_coco.py):
# 24 epochs, milestones [16, 22], random train scales 480..800 short side.
_base_ = ['tood_r50_fpn_1x_coco.py']
train_cfg = dict(epochs=24)
optim = dict(milestones_epochs=(16, 22))
train_dataloader = dict(
    pipeline=dict(
        scale=(1333, 800),
        ms_scales=((1333, 480), (1333, 560), (1333, 640), (1333, 720),
                   (1333, 800)),
    ))
