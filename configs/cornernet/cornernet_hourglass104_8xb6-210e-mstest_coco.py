# CornerNet HG-104 (reference configs/cornernet/*mstest_coco.py).
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/default_runtime.py',
]
model = dict(type='CornerNet', num_classes=80,
             compute_dtype='bfloat16',
             test_cfg=dict(corner_topk=100, distance_threshold=0.5,
                           score_thr=0.05, max_per_img=100,
                           nms_iou_threshold=0.5))
# reference: Adam lr 5e-4, 210 epochs, step 180
train_cfg = dict(epochs=210, val_interval=1)
optim_wrapper = dict(optimizer=dict(type='Adam', lr=0.0005))
optim = dict(milestones_epochs=(180,), gamma=0.1, weight_decay=0.0)
