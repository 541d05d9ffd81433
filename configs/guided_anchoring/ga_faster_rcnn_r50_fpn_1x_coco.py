# GA-Faster R-CNN (reference
# configs/guided_anchoring/ga-faster-rcnn_r50_fpn_1x_coco.py): guided
# anchoring RPN (loc/shape/feature-adaption), stds 0.07/0.11 anchor
# coder, 300 proposals, tightened rcnn stds.
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
model = dict(type='GAFasterRCNN')
