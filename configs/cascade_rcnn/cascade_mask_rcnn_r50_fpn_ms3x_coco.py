# Cascade Mask R-CNN R50-FPN multi-scale 3x
# (reference configs/cascade_rcnn/cascade-mask-rcnn_r50_fpn_ms-3x_coco.py:
# 36 epochs, milestones [28, 34] via common/ms_3x_coco-instance.py).
_base_ = ['./cascade_mask_rcnn_r50_fpn_1x_coco.py']

train_cfg = dict(epochs=36)
optim = dict(milestones_epochs=(28, 34))

train_dataloader = dict(
    pipeline=dict(
        scale=(1333, 800),
        ms_scales=((1333, 640), (1333, 672), (1333, 704), (1333, 736),
                   (1333, 768), (1333, 800)),
    ))
