# 3x variant (reference configs/gn/mask-rcnn_r50_fpn_gn-all_3x_coco.py:
# 36 epochs, LR steps [28, 34]).
_base_ = ['mask_rcnn_r50_fpn_gn-all_2x_coco.py']
train_cfg = dict(epochs=36)
optim = dict(milestones_epochs=(28, 34))
