# Fast R-CNN with precomputed proposals
# (reference configs/fast_rcnn/fast-rcnn_r50_fpn_1x_coco.py).
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
model = dict(type='FastRCNN')
