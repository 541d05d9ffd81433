# SSD300 face detector on WIDER Face (reference
# configs/wider_face/ssd300_8xb32-24e_widerface.py: 1 class, min_size 17,
# SGD 0.012, steps [16, 20], 24 epochs).
_base_ = '../ssd/ssd300_coco.py'
data_root = 'data/WIDERFace/'
model = dict(num_classes=1)
train_dataloader = dict(
    batch_size=32,
    dataset=dict(type='WIDERFaceDataset', split_file='train.txt',
                 img_prefix='WIDER_train/images', min_size=17))
val_dataloader = dict(
    dataset=dict(type='WIDERFaceDataset', split_file='val.txt',
                 img_prefix='WIDER_val/images'),
    pipeline=dict(scale=(300, 300)))
test_dataloader = val_dataloader
# WIDERFace is evaluated with the VOC 11-point protocol in the reference
# (VOCMetric analogue); the dataset is single-class faces
val_evaluator = dict(type='VOCMetric', metric='mAP')
test_evaluator = val_evaluator
optim = dict(lr=0.012, milestones_epochs=(16, 20))
train_cfg = dict(epochs=24)
auto_scale_lr = dict(enable=True, base_batch_size=256)
