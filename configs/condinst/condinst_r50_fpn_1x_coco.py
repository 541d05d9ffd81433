# CondInst (reference configs/condinst/condinst_r50_fpn_ms-poly-90k_coco).
_base_ = [
    '../_base_/datasets/coco_instance.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='CondInst', num_classes=80, depth=50,
             compute_dtype='bfloat16', frozen_stages=1,
             test_cfg=dict(score_thr=0.05, nms_pre=1000,
                           nms_iou_threshold=0.6, max_per_img=100))
