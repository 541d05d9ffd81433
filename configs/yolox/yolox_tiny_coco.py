# YOLOX-tiny (reference configs/yolox/yolox_tiny_8xb8-300e_coco.py):
# deepen 0.33 / widen 0.375; the tiny recipe drops MixUp, widens the
# RandomAffine scaling to (0.5, 2.0) and tests at (416, 416).
_base_ = ['yolox_s_coco.py']
model = dict(deepen=0.33, widen=0.375)
train_dataloader = dict(pipeline=dict(
    scale=(640, 640),
    strong_aug=[
        dict(type='Mosaic', img_scale=(640, 640)),
        dict(type='RandomAffine', scaling_ratio_range=(0.5, 1.5),
             border=(-320, -320)),
        dict(type='YOLOXHSVRandomAug'),
    ]))
val_dataloader = dict(pipeline=dict(scale=(416, 416)))
test_dataloader = val_dataloader
