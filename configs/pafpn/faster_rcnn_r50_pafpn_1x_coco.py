# PAFPN: FPN + bottom-up path augmentation (PANet)
# (reference configs/pafpn/faster-rcnn_r50_pafpn_1x_coco.py).
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
model = dict(neck=dict(type='PAFPN', out_channels=256, num_outs=5))
