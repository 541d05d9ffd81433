# CenterNet-update (CenterNet2's CenterNet over FPN; reference
# configs/centernet/centernet-update_r50-caffe_fpn_ms-1x_coco.py).
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='CenterNetUpdate', num_classes=80, depth=50,
             compute_dtype='bfloat16',
             test_cfg=dict(score_thr=0.05, nms_pre=1000,
                           nms_iou_threshold=0.6, max_per_img=100))
train_dataloader = dict(pipeline=dict(ms_scales=[[1333, 640], [1333, 672],
                                                 [1333, 704], [1333, 736],
                                                 [1333, 768], [1333, 800]]))
# reference: SGD lr 0.01 with 1000-iter warmup from 0.00025
optim = dict(lr=0.01, warmup_iters=1000, warmup_factor=0.025)
