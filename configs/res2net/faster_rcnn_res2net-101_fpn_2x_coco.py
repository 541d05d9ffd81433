# Faster R-CNN with Res2Net-101 (reference
# configs/res2net/faster-rcnn_res2net-101_fpn_2x_coco.py).
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py']
model = dict(backbone=dict(type='Res2Net', depth=101, scales=4,
                           base_width=26))
train_cfg = dict(epochs=24)
optim = dict(milestones_epochs=(16, 22))
