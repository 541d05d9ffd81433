# Faster R-CNN R50-FPN 1x (reference configs/faster_rcnn/faster-rcnn_r50_fpn_1x_coco.py).
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
optim = dict(lr=0.02)
model = dict(type='FasterRCNN', num_classes=80, depth=50,
             compute_dtype='bfloat16', frozen_stages=1,
             test_cfg=dict(score_thr=0.05, nms_iou_threshold=0.5,
                           max_per_img=100))
