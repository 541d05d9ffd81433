# Faster R-CNN with HRNetV2p-W18 (reference
# configs/hrnet/faster-rcnn_hrnetv2p-w18-1x_coco.py; the reference pairs
# HRNet with HRFPN — here the multi-resolution outputs feed the standard
# FPN, which consumes the same 4-level pyramid contract).
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py']
model = dict(backbone=dict(type='HRNet', width=18))
