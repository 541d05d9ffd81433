# GA-RetinaNet R50-FPN 1x (reference
# configs/guided_anchoring/ga-retinanet_r50_fpn_1x_coco.py): RetinaNet
# whose single square scale-4 anchor is guided by predicted shapes.
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='GARetinaNet', num_classes=80, depth=50,
             compute_dtype='bfloat16',
             test_cfg=dict(score_thr=0.05, nms_pre=1000,
                           nms_iou_threshold=0.5, max_per_img=100,
                           loc_filter_thr=0.01))
optim = dict(grad_clip=35.0)
