# Cascade RPN + Faster R-CNN (reference
# configs/cascade_rpn/cascade-rpn_faster-rcnn_r50-caffe_fpn_1x_coco.py):
# rpn_weight 0.7, rcnn stds 0.04/0.08, cls weight 1.5.
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
model = dict(type='CascadeRPNFasterRCNN')
