# AutoAssign (reference configs/autoassign/autoassign_r50-caffe_fpn_1x).
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='AutoAssign', num_classes=80, depth=50,
             compute_dtype='bfloat16', frozen_stages=1,
             test_cfg=dict(score_thr=0.05, nms_pre=1000,
                           nms_iou_threshold=0.6, max_per_img=100))
