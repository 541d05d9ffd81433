# COCO instance-segmentation data config (gt mask crops enabled) (mirrors the reference's
# configs/_base_/datasets/coco_detection.py pipeline semantics with static
# shape buckets instead of pad-to-batch).
data_root = 'data/coco/'

train_dataloader = dict(
    batch_size=16,
    num_workers=8,
    seed=0,
    drop_last=True,
    shuffle=True,
    dataset=dict(
        ann_file='annotations/instances_train2017.json',
        img_prefix='train2017/',
        filter_empty_gt=True,
        min_size=32,
        with_mask=True,
    ),
    pipeline=dict(scale=(1333, 800), flip_prob=0.5, max_gt=100),
)

val_dataloader = dict(
    batch_size=8,
    num_workers=8,
    drop_last=False,
    shuffle=False,
    dataset=dict(
        ann_file='annotations/instances_val2017.json',
        img_prefix='val2017/',
        with_mask=True,
    ),
    pipeline=dict(scale=(1333, 800), flip_prob=0.0, max_gt=100),
)

val_evaluator = dict(classwise=False, outfile_prefix=None)
test_dataloader = val_dataloader
test_evaluator = val_evaluator
