# Cascade Mask R-CNN R50-FPN 1x
# (reference configs/cascade_rcnn/cascade-mask-rcnn_r50_fpn_1x_coco.py).
_base_ = ['./cascade_rcnn_r50_fpn_1x_coco.py']
model = dict(type='CascadeMaskRCNN')
train_dataloader = dict(dataset=dict(with_mask=True))
