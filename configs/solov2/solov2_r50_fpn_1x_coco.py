# SOLOv2 R50-FPN 1x (reference configs/solov2/solov2_r50_fpn_1x_coco.py).
_base_ = [
    '../_base_/datasets/coco_instance.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='SOLOv2', num_classes=80, depth=50,
             compute_dtype='bfloat16', frozen_stages=1,
             test_cfg=dict(nms_pre=500, score_thr=0.1, mask_thr=0.5,
                           filter_thr=0.05, max_per_img=100))
val_evaluator = dict(metric='segm')
test_evaluator = val_evaluator
