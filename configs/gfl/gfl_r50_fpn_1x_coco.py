# GFL R50-FPN 1x, full 80 COCO categories (upstream baseline model; reference
# configs/gfl/gfl_r50_fpn_1x_coco.py).
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]

model = dict(
    type='GFL',
    num_classes=80,
    depth=50,
    reg_max=16,
    compute_dtype='bfloat16',
    frozen_stages=1,
    pretrained_backbone=None,  # path to a torchvision resnet50 .pth
    train_cfg=dict(assigner_topk=9),
    test_cfg=dict(
        nms_pre=1000,
        min_bbox_size=0,
        score_thr=0.05,
        nms_iou_threshold=0.6,
        max_per_img=100,
    ),
)
