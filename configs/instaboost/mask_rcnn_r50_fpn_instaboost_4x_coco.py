# Mask R-CNN + InstaBoost 4x (reference configs/instaboost/
# mask-rcnn_r50_fpn_instaboost-4x_coco.py): the InstaBoost 'normal'
# action (the only one the reference's action_prob=(1,0,0) ever takes)
# jitters each instance in place with scale (0.8,1.2), shift w/15 x h/15,
# rotation +-1 deg, applied with probability 0.5; 48-epoch schedule with
# MultiStep [32, 44].
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py']
train_dataloader = dict(pipeline=dict(
    strong_aug=[dict(type='InstaBoost', scale=(0.8, 1.2), dx=15, dy=15,
                     theta=(-1, 1), aug_ratio=0.5)]))
train_cfg = dict(epochs=48)
optim = dict(milestones_epochs=(32, 44))
