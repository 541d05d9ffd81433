# ERD stage 1: plain GFL on the first 40 COCO categories (reference
# configs/gfl_increment/gfl_r50_fpn_1x_coco_first_40_cats.py).
_base_ = ['../gfl/gfl_r50_fpn_1x_coco.py']

model = dict(num_classes=40)

train_dataloader = dict(
    dataset=dict(
        ann_file='annotations/instances_train2017_sel_first_40_cats.json'))
val_dataloader = dict(
    dataset=dict(
        ann_file='annotations/instances_val2017_sel_first_40_cats.json'))
test_dataloader = val_dataloader
