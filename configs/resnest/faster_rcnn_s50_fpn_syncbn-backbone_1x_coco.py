# Faster R-CNN with ResNeSt-50 (reference
# configs/resnest/faster-rcnn_s50_fpn_syncbn-backbone+all-rpn-1x_coco.py;
# SyncBN is implicit under SPMD — see docs/PARITY.md section 2.7).
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py']
model = dict(backbone=dict(type='ResNeSt', depth=50, radix=2, groups=1,
                           base_width=4))
