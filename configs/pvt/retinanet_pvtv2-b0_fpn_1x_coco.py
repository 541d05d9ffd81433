# PVTv2-b0 detector (reference configs/pvt/retinanet_pvtv2-b0_fpn_1x_coco.py
# rides RetinaNet; the backbone-swap assembly here is the GFL family,
# which shares RetinaNet's FPN + dense-head shape).
_base_ = ['../gfl/gfl_r50_fpn_1x_coco.py']
model = dict(backbone=dict(type='PVTv2', arch='b0'))
optim = dict(type='AdamW', lr=0.0001)
