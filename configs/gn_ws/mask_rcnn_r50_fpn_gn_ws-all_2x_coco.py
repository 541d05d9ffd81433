# Mask R-CNN R50 GN+WS 2x (reference
# configs/gn+ws/mask-rcnn_r50_fpn_gn-ws-all_2x_coco.py).
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py',
          '../_base_/schedules/schedule_2x.py']
model = dict(
    backbone=dict(type='ResNet', depth=50, norm='gn', conv_ws=True,
                  frozen_stages=1),
    head_norm='GN',
    conv_ws=True,
    bbox_head='Shared4Conv1FCBBoxHead',
)
