# Mask R-CNN with Swin-T (reference
# configs/swin/mask-rcnn_swin-t-p4-w7_fpn_1x_coco.py).
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py']
model = dict(backbone=dict(type='SwinTransformer', arch='tiny',
                           window_size=7))
# reference recipe: AdamW 1e-4, wd 0.05
optim = dict(type='AdamW', lr=0.0001, weight_decay=0.05,
             warmup_iters=500, milestones_epochs=(8, 11))
