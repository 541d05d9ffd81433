# Mask R-CNN R50 + DCNv2 C3-C5, 1x (reference
# configs/dcnv2/mask-rcnn_r50-mdconv-c3-c5_fpn_1x_coco.py).
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py']
model = dict(backbone=dict(type='ResNet', depth=50, frozen_stages=1,
                           dcn_stages=(False, True, True, True),
                           dcn_modulated=True))
