# Faster R-CNN R50-FPN 1x with soft-NMS at test time
# (reference configs/faster_rcnn/faster-rcnn_r50_fpn_soft-nms_1x_coco.py:
# rcnn test_cfg nms=dict(type='soft_nms', iou_threshold=0.5)).
_base_ = './faster_rcnn_r50_fpn_1x_coco.py'
model = dict(test_cfg=dict(nms_type='soft_nms', nms_iou_threshold=0.5,
                           soft_nms_method='linear'))
