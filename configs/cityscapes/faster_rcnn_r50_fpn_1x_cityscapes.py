# Faster R-CNN on Cityscapes instances (reference
# configs/cityscapes/faster-rcnn_r50_fpn_1x_cityscapes.py; jsons come
# from tools/dataset_converters/cityscapes.py).
_base_ = ['../_base_/default_runtime.py']
data_root = 'data/cityscapes/'
model = dict(type='FasterRCNN', num_classes=8, depth=50,
             compute_dtype='bfloat16')
train_dataloader = dict(
    batch_size=8, num_workers=8, seed=0,
    dataset=dict(type='CityscapesDataset',
                 ann_file='annotations/instancesonly_filtered_gtFine_train.json',
                 img_prefix='leftImg8bit/train/'),
    pipeline=dict(scale=(2048, 800), flip_prob=0.5, max_gt=100,
                  ms_scales=((2048, 800), (2048, 1024))))
val_dataloader = dict(
    batch_size=4, shuffle=False, drop_last=False,
    dataset=dict(type='CityscapesDataset',
                 ann_file='annotations/instancesonly_filtered_gtFine_val.json',
                 img_prefix='leftImg8bit/val/'),
    pipeline=dict(scale=(2048, 1024), flip_prob=0.0, max_gt=100))
val_evaluator = dict(classwise=True)
test_dataloader = val_dataloader
test_evaluator = val_evaluator
train_cfg = dict(epochs=8, val_interval=1)
optim = dict(lr=0.01, milestones_epochs=(7,), warmup_iters=500)
