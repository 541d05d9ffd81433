# Faster R-CNN with RegNetX-3.2GF (reference
# configs/regnet/faster-rcnn_regnetx-3.2GF_fpn_1x_coco.py).
_base_ = ['../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py']
model = dict(backbone=dict(type='RegNet', arch='regnetx_3.2gf'))
