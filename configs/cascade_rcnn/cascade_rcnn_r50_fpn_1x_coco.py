# Cascade R-CNN R50-FPN 1x (reference configs/cascade_rcnn/
# cascade-rcnn_r50_fpn_1x_coco.py): 3 IoU-progressive stages 0.5/0.6/0.7.
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='CascadeRCNN', num_classes=80, depth=50,
             compute_dtype='bfloat16',
             test_cfg=dict(score_thr=0.05, nms_iou_threshold=0.5,
                           max_per_img=100))
