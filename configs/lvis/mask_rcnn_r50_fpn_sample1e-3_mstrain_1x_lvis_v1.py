# Mask R-CNN on LVIS v1 with class-aware (oversampling) training
# (reference configs/lvis/mask-rcnn_r50_fpn_sample1e-3_ms-1x_lvis-v1.py;
# the RFS sampler's long-tail rebalancing maps to the ClassAwareSampler
# loader mode here).
_base_ = ['../_base_/default_runtime.py',
          '../_base_/schedules/schedule_1x.py']
data_root = 'data/lvis_v1/'
model = dict(type='MaskRCNN', num_classes=1203, depth=50,
             compute_dtype='bfloat16')
train_dataloader = dict(
    batch_size=16, num_workers=8, seed=0,
    sampler='class_aware', num_sample_class=1,
    dataset=dict(type='LVISDataset',
                 ann_file='annotations/lvis_v1_train.json',
                 img_prefix='', with_mask=True),
    pipeline=dict(scale=(1333, 800), flip_prob=0.5, max_gt=300,
                  ms_scales=((1333, 640), (1333, 672), (1333, 704),
                             (1333, 736), (1333, 768), (1333, 800))))
val_dataloader = dict(
    batch_size=8, shuffle=False, drop_last=False,
    dataset=dict(type='LVISDataset',
                 ann_file='annotations/lvis_v1_val.json', img_prefix=''),
    pipeline=dict(scale=(1333, 800), flip_prob=0.0, max_gt=300))
val_evaluator = dict(type='LVISMetric', metric=('bbox', 'segm'))
test_dataloader = val_dataloader
test_evaluator = val_evaluator
