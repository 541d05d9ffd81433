# GA-RPN proposal network (reference
# configs/guided_anchoring/ga-rpn_r50_fpn_1x_coco.py).
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
model = dict(type='GARPN')
