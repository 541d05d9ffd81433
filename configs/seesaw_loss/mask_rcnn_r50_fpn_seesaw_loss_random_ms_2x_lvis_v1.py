# Mask R-CNN + SeesawLoss on LVIS v1 (reference configs/seesaw_loss/
# mask-rcnn_r50_fpn_seesaw-loss_random-ms-2x_lvis-v1.py): the bbox head
# classifies with the seesaw CE (p=0.8, q=2.0) over C+2 channels (C class
# logits + 2-way fg/bg objectness) through a NormedLinear (temperature 20)
# cosine predictor; LVIS test_cfg opens score_thr to 1e-4 / 300 dets.
_base_ = ['../_base_/default_runtime.py',
          '../_base_/schedules/schedule_2x.py']
data_root = 'data/lvis_v1/'
model = dict(type='MaskRCNN', num_classes=1203, depth=50,
             compute_dtype='bfloat16',
             loss_cls='seesaw', seesaw_p=0.8, seesaw_q=2.0,
             test_cfg=dict(score_thr=0.0001, max_per_img=300))
train_dataloader = dict(
    batch_size=16, num_workers=8, seed=0,
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
