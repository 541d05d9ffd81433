# Dynamic R-CNN (reference configs/dynamic_rcnn/dynamic-rcnn_r50_fpn_1x).
_base_ = '../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py'
model = dict(type='DynamicRCNN',
             train_cfg=dict(initial_iou=0.4, iou_topk=75,
                            initial_beta=1.0, beta_topk=10))
