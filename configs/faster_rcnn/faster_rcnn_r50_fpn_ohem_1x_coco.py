# Faster R-CNN R50-FPN 1x with OHEM RoI sampling
# (reference configs/faster_rcnn/faster-rcnn_r50_fpn_ohem_1x_coco.py:
# train_cfg rcnn sampler type='OHEMSampler').
_base_ = './faster_rcnn_r50_fpn_1x_coco.py'
model = dict(train_cfg=dict(rcnn_sampler='ohem'))
