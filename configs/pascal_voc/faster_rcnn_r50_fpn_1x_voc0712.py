# Faster R-CNN on PASCAL VOC 07+12 trainval (reference
# configs/pascal_voc/faster-rcnn_r50_fpn_1x_voc0712.py).
_base_ = ['../_base_/default_runtime.py']
data_root = 'data/VOCdevkit/'
model = dict(type='FasterRCNN', num_classes=20, depth=50,
             compute_dtype='bfloat16')
train_dataloader = dict(
    batch_size=16, num_workers=8, seed=0,
    dataset=dict(type='VOCDataset', ann_file='', split='trainval',
                 year='2007', sub_data_root='VOC2007'),
    pipeline=dict(scale=(1000, 600), flip_prob=0.5, max_gt=100))
val_dataloader = dict(
    batch_size=8, shuffle=False, drop_last=False,
    dataset=dict(type='VOCDataset', ann_file='', split='test',
                 year='2007', sub_data_root='VOC2007'),
    pipeline=dict(scale=(1000, 600), flip_prob=0.0, max_gt=100))
val_evaluator = dict(metric='mAP')  # VOC protocol
test_dataloader = val_dataloader
test_evaluator = val_evaluator
# reference: 4 epochs, step at 3
train_cfg = dict(epochs=4, val_interval=1)
optim = dict(lr=0.01, milestones_epochs=(3,), warmup_iters=500)
