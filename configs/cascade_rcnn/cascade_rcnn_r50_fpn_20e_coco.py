# Cascade R-CNN R50-FPN 20e (reference
# configs/cascade_rcnn/cascade-rcnn_r50_fpn_20e_coco.py):
# 20 epochs, milestones [16, 19].
_base_ = ['cascade_rcnn_r50_fpn_1x_coco.py']
train_cfg = dict(epochs=20)
optim = dict(milestones_epochs=(16, 19))
