# Cascade RPN proposal network (reference
# configs/cascade_rpn/cascade-rpn_r50-caffe_fpn_1x_coco.py).
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
model = dict(type='CascadeRPN')
