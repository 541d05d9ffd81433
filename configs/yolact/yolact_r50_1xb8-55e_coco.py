# YOLACT (reference configs/yolact/yolact_r50_1xb8-55e_coco.py).
_base_ = [
    '../_base_/datasets/coco_instance.py',
    '../_base_/default_runtime.py',
]
model = dict(type='YOLACT', num_classes=80, depth=50,
             compute_dtype='bfloat16', frozen_stages=-1,
             test_cfg=dict(score_thr=0.05, nms_iou_threshold=0.5,
                           max_per_img=100))
# reference: SGD 1e-3, 55 epochs, steps [20, 42, 49, 52]
train_cfg = dict(epochs=55, val_interval=1)
optim_wrapper = dict(optimizer=dict(type='SGD', lr=0.001, momentum=0.9,
                                    weight_decay=5e-4))
optim = dict(milestones_epochs=(20, 42, 49, 52), gamma=0.1)
