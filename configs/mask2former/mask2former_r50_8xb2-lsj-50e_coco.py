# Mask2Former instance segmentation
# (reference configs/mask2former/mask2former_r50_8xb2-lsj-50e_coco.py).
_base_ = [
    '../_base_/datasets/coco_instance.py',
    '../_base_/default_runtime.py',
]
model = dict(type='Mask2Former', num_classes=80, depth=50,
             num_queries=100, num_decoder_layers=9,
             compute_dtype='bfloat16',
             test_cfg=dict(max_per_img=100))
# reference: AdamW 1e-4, 50 epochs (368750 iters), LR drops at ~0.89
# and ~0.96 of the schedule (steps [327778, 355092] iters)
train_cfg = dict(epochs=50, val_interval=1)
optim_wrapper = dict(optimizer=dict(type='AdamW', lr=0.0001,
                                    weight_decay=0.05),
                     paramwise_cfg=dict(backbone_lr_mult=0.1),
                     clip_grad=dict(max_norm=0.01, norm_type=2))
optim = dict(milestones_epochs=(44, 48), gamma=0.1)
