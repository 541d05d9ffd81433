# SABL RetinaNet R50-FPN 1x
# (reference configs/sabl/sabl-retinanet_r50_fpn_1x_coco.py).
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='SABLRetinaNet', num_classes=80, depth=50,
             compute_dtype='bfloat16', num_buckets=14,
             bucket_scale_factor=3.0,
             test_cfg=dict(score_thr=0.05, nms_pre=1000,
                           nms_iou_threshold=0.5, max_per_img=100))
optimizer = dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=0.0001)
