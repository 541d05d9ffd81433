# YOLOv3 Darknet-53 608x608 (reference configs/yolo/yolov3_d53_8xb8-ms-608-273e_coco.py).
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='YOLOV3', num_classes=80, compute_dtype='bfloat16',
             frozen_stages=-1,
             test_cfg=dict(score_thr=0.05, nms_iou_threshold=0.45,
                           max_per_img=100))
train_dataloader = dict(pipeline=dict(scale=(608, 608)))
val_dataloader = dict(pipeline=dict(scale=(608, 608)))
test_dataloader = val_dataloader
