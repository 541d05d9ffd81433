# Mask R-CNN with ConvNeXt-T (reference
# configs/convnext/mask-rcnn_convnext-t-p4-w7_fpn_amp-ms-crop-3x_coco.py,
# 1x schedule form).
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py']
model = dict(backbone=dict(type='ConvNeXt', arch='tiny'))
optim = dict(type='AdamW', lr=0.0001, weight_decay=0.05)
