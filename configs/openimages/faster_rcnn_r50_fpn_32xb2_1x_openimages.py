# Faster R-CNN on Open Images v6: 601 boxable classes, class-hierarchy
# expansion + group-of handling live in OpenImagesDataset/-Metric
# (reference configs/openimages/faster-rcnn_r50_fpn_32xb2-1x_openimages.py).
_base_ = [
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
data_root = 'data/OpenImages/'
model = dict(type='FasterRCNN', num_classes=601, depth=50,
             compute_dtype='bfloat16', frozen_stages=1,
             test_cfg=dict(score_thr=0.05, nms_iou_threshold=0.5,
                           max_per_img=100))
train_dataloader = dict(
    batch_size=16, num_workers=8, seed=0,
    dataset=dict(type='OpenImagesDataset',
                 ann_file='annotations/oidv6-train-annotations-bbox.csv',
                 img_prefix='OpenImages/train/',
                 label_file='annotations/class-descriptions-boxable.csv',
                 hierarchy_file='annotations/bbox_labels_600_hierarchy.json',
                 meta_file='annotations/train-image-metas.pkl'),
    pipeline=dict(scale=(1333, 800), flip_prob=0.5, max_gt=100))
val_dataloader = dict(
    batch_size=8, shuffle=False, drop_last=False,
    dataset=dict(type='OpenImagesDataset',
                 ann_file='annotations/validation-annotations-bbox.csv',
                 img_prefix='OpenImages/validation/',
                 label_file='annotations/class-descriptions-boxable.csv',
                 hierarchy_file='annotations/bbox_labels_600_hierarchy.json',
                 meta_file='annotations/validation-image-metas.pkl',
                 image_level_ann_file='annotations/'
                 'validation-annotations-human-imagelabels-boxable.csv'),
    pipeline=dict(scale=(1333, 800), flip_prob=0.0, max_gt=100))
# OpenImagesMetric: VOC-style all-point AP @ IoU .5 with parent-class
# expansion and group-of IoA matching
val_evaluator = dict(type='OpenImagesMetric', iou_thr=0.5, ioa_thr=0.5)
test_dataloader = val_dataloader
test_evaluator = val_evaluator
# reference: 32x2 global batch, SGD 0.08
optim = dict(lr=0.08)
auto_scale_lr = dict(enable=True, base_batch_size=64)
