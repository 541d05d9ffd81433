# Faster R-CNN R50 + MODULATED deformable conv (DCNv2) C3-C5, 1x
# (reference configs/dcnv2/faster-rcnn_r50-mdconv-c3-c5_fpn_1x_coco.py:
# dcn=dict(type='DCNv2'), stage_with_dcn=(False, True, True, True)).
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py']
model = dict(backbone=dict(type='ResNet', depth=50, frozen_stages=1,
                           dcn_stages=(False, True, True, True),
                           dcn_modulated=True))
