# Sparse R-CNN (reference configs/sparse_rcnn/sparse-rcnn_r50_fpn_1x_coco).
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='SparseRCNN', num_classes=80, depth=50,
             num_proposals=100, num_stages=6,
             compute_dtype='bfloat16', frozen_stages=1,
             test_cfg=dict(max_per_img=100))
# reference: AdamW 2.5e-5, grad clip 1.0
optim_wrapper = dict(optimizer=dict(type='AdamW', lr=0.000025,
                                    weight_decay=0.0001),
                     clip_grad=dict(max_norm=1, norm_type=2))
