# CARAFE on Mask R-CNN
# (reference configs/carafe/mask-rcnn_r50_fpn-carafe_1x_coco.py).
_base_ = '../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py'
model = dict(neck=dict(type='FPN_CARAFE', out_channels=256, num_outs=5,
                       start_level=0))
