# SOLO v1 (reference configs/solo/solo_r50_fpn_1x_coco.py).
_base_ = [
    '../_base_/datasets/coco_instance.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='SOLO', num_classes=80, depth=50,
             compute_dtype='bfloat16', frozen_stages=1,
             test_cfg=dict(nms_pre=500, score_thr=0.1, max_per_img=100))
