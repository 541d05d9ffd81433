# TridentNet (reference configs/tridentnet/tridentnet_r50-caffe_1x_coco).
_base_ = [
    '../_base_/datasets/coco_detection.py',
    '../_base_/schedules/schedule_1x.py',
    '../_base_/default_runtime.py',
]
model = dict(type='TridentFasterRCNN', num_classes=80, depth=50,
             compute_dtype='bfloat16',
             test_cfg=dict(score_thr=0.05, nms_iou_threshold=0.5,
                           max_per_img=100))
