# CARAFE: content-aware upsampling in the FPN top-down path
# (reference configs/carafe/faster-rcnn_r50_fpn-carafe_1x_coco.py).
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
model = dict(neck=dict(type='FPN_CARAFE', out_channels=256, num_outs=5,
                       start_level=0))
