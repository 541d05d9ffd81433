# Faster R-CNN on Objects365 v2 (reference
# configs/objects365/faster-rcnn_r50_fpn_16xb4-1x_objects365v2.py).
_base_ = ['../_base_/default_runtime.py',
          '../_base_/schedules/schedule_1x.py']
data_root = 'data/objects365v2/'
model = dict(type='FasterRCNN', num_classes=365, depth=50,
             compute_dtype='bfloat16')
train_dataloader = dict(
    batch_size=64, num_workers=8, seed=0,
    dataset=dict(type='Objects365V2Dataset',
                 ann_file='annotations/zhiyuan_objv2_train.json',
                 img_prefix='train/'),
    pipeline=dict(scale=(1333, 800), flip_prob=0.5, max_gt=100))
val_dataloader = dict(
    batch_size=8, shuffle=False, drop_last=False,
    dataset=dict(type='Objects365V2Dataset',
                 ann_file='annotations/zhiyuan_objv2_val.json',
                 img_prefix='val/'),
    pipeline=dict(scale=(1333, 800), flip_prob=0.0, max_gt=100))
val_evaluator = dict(classwise=False)
test_dataloader = val_dataloader
test_evaluator = val_evaluator
auto_scale_lr = dict(enable=True, base_batch_size=64)
