# Mask R-CNN R50 with GroupNorm everywhere, 2x (reference
# configs/gn/mask-rcnn_r50_fpn_gn-all_2x_coco.py: norm_cfg=dict(type='GN',
# num_groups=32) on backbone/neck/Shared4Conv1FCBBoxHead/mask head).
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py',
          '../_base_/schedules/schedule_2x.py']
model = dict(
    backbone=dict(type='ResNet', depth=50, norm='gn', frozen_stages=1),
    head_norm='GN',
    bbox_head='Shared4Conv1FCBBoxHead',
)
