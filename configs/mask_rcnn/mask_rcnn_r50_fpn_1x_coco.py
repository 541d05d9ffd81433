# Mask R-CNN R50-FPN 1x (reference configs/mask_rcnn/mask-rcnn_r50_fpn_1x_coco.py).
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py']
model = dict(type='MaskRCNN')
train_dataloader = dict(dataset=dict(with_mask=True))
