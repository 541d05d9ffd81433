# Cascade Mask R-CNN R101-FPN 1x
# (reference configs/cascade_rcnn/cascade-mask-rcnn_r101_fpn_1x_coco.py).
_base_ = ['./cascade_mask_rcnn_r50_fpn_1x_coco.py']
model = dict(depth=101)
