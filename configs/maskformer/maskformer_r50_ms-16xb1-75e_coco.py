# MaskFormer: per-query mask classification, plain (unmasked) decoder
# attention — Mask2Former minus masked attention, 6 decoder layers
# (reference configs/maskformer/maskformer_r50_ms-16xb1-75e_coco.py).
_base_ = [
    '../_base_/datasets/coco_instance.py',
    '../_base_/default_runtime.py',
]
model = dict(type='MaskFormer', num_classes=80, depth=50,
             num_queries=100, num_decoder_layers=6,
             compute_dtype='bfloat16',
             test_cfg=dict(max_per_img=100))
train_cfg = dict(epochs=75, val_interval=1)
# reference: AdamW 1e-4 / wd 1e-4, backbone lr x0.1, drop at epoch 50,
# grad clip 0.01
optim_wrapper = dict(optimizer=dict(type='AdamW', lr=0.0001,
                                    weight_decay=0.0001),
                     paramwise_cfg=dict(backbone_lr_mult=0.1),
                     clip_grad=dict(max_norm=0.01, norm_type=2))
optim = dict(milestones_epochs=(50,), gamma=0.1)
