# SoftTeacher semi-supervised Faster R-CNN (reference
# configs/soft_teacher/soft-teacher_faster-rcnn_r50-caffe_fpn_180k_semi-0.1-coco.py).
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/default_runtime.py',
]
model = dict(type='SoftTeacher', num_classes=80, depth=50,
             compute_dtype='bfloat16',
             semi_train_cfg=dict(
                 pseudo_label_initial_score_thr=0.5,
                 rpn_pseudo_thr=0.9, cls_pseudo_thr=0.9,
                 reg_pseudo_thr=0.02, jitter_times=10,
                 jitter_scale=0.06, unsup_weight=4.0),
             test_cfg=dict(score_thr=0.05, max_per_img=100))
# reference: SGD 0.01, 180k iters constant LR (-> 12 epochs here)
train_cfg = dict(epochs=12, val_interval=1)
optim = dict(lr=0.01, momentum=0.9, weight_decay=1e-4,
             milestones_epochs=(), warmup_iters=500)
# unsupervised split rides a second dataloader with photometric-only
# strong augmentation (weak/strong views share geometry)
