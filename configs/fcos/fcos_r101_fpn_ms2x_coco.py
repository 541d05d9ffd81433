# FCOS R101-FPN gn-head ms-640-800 2x (reference
# configs/fcos/fcos_r101-caffe_fpn_gn-head_ms-640-800-2x_coco.py):
# 24 epochs, milestones [16, 22], random train scales 640..800 short side.
_base_ = ['fcos_r50_fpn_1x_coco.py']
model = dict(depth=101)
train_cfg = dict(epochs=24)
optim = dict(milestones_epochs=(16, 22))
train_dataloader = dict(
    pipeline=dict(
        scale=(1333, 800),
        ms_scales=((1333, 640), (1333, 720), (1333, 800)),
    ))
