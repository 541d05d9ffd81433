# PAA R50-FPN 2x (reference configs/paa/paa_r50_fpn_2x_coco.py):
# 24 epochs, milestones [16, 22].
_base_ = ['paa_r50_fpn_1x_coco.py']
train_cfg = dict(epochs=24)
optim = dict(milestones_epochs=(16, 22))
