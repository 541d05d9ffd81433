# ERD stage 2: incremental last-40 training distilling from the stage-1
# teacher (reference configs/gfl_increment/
# gfl_r50_fpn_1x_coco_first_40_incre_last_40_cats.py).
_base_ = ['../gfl/gfl_r50_fpn_1x_coco.py']

model = dict(
    type='GFLIncrementERD',
    num_classes=80,
    ori_setting=dict(
        ori_checkpoint_file='work_dirs/gfl_first_40/latest',
        ori_num_classes=40,
        ori_config_file='configs/gfl_increment/'
                        'gfl_r50_fpn_1x_coco_first_40_cats.py',
    ),
    erd=dict(
        dist_loss_weight=1.0,
        ld_weight=0.25,
        ld_T=10,
        distill_nms_iou=0.005,
        # the cls-branch ERS selection is dense-exact (no cap knob; see
        # ers_cls_mask_dense in models/detectors/gfl_erd.py)
        # 0 = auto-exact reg candidate cap (N//5+1, one-sided Chebyshev
        # bound on mu+2sigma selections — provably never truncates; see
        # ERDConfig in models/detectors/gfl_erd.py)
        ers_reg_cap=0,
    ),
)

train_dataloader = dict(
    dataset=dict(
        ann_file='annotations/instances_train2017_sel_last_40_cats.json'))
val_dataloader = dict(
    dataset=dict(ann_file='annotations/instances_val2017.json'))
test_dataloader = val_dataloader
test_evaluator = dict(classwise=True)
