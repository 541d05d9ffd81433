# PointRend (reference configs/point_rend/point-rend_r50-caffe_fpn_ms-1x).
_base_ = [
    '../_base_/datasets/coco_instance.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='PointRend', num_classes=80, depth=50,
             compute_dtype='bfloat16', frozen_stages=1,
             test_cfg=dict(score_thr=0.05, nms_iou_threshold=0.5,
                           max_per_img=100))
