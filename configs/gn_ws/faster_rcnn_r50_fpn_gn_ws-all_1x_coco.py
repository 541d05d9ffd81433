# Faster R-CNN R50 with GN + Weight Standardization everywhere, 1x
# (reference configs/gn+ws/faster-rcnn_r50_fpn_gn-ws-all_1x_coco.py:
# conv_cfg=dict(type='ConvWS'), norm_cfg=GN(32), Shared4Conv1FCBBoxHead).
# Directory named gn_ws because '+' is awkward in python module paths.
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py']
model = dict(
    backbone=dict(type='ResNet', depth=50, norm='gn', conv_ws=True,
                  frozen_stages=1),
    head_norm='GN',
    conv_ws=True,
    bbox_head='Shared4Conv1FCBBoxHead',
)
