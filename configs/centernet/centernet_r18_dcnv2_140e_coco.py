# CenterNet R18-DCNv2 140e
# (reference configs/centernet/centernet_r18-dcnv2_8xb16-crop512-140e_coco.py).
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/default_runtime.py',
]
model = dict(type='CenterNet', num_classes=80, depth=18, use_dcn=True,
             compute_dtype='bfloat16',
             test_cfg=dict(max_per_img=100))
train_cfg = dict(max_epochs=140, val_interval=5)
optimizer = dict(type='SGD', lr=0.02)
