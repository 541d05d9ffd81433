# LD: localization distillation, GFL R50 student + GFL R50 teacher
# (reference configs/ld/ld_r18-gflv1-r101_fpn_1x_coco.py family).
_base_ = ['../gfl/gfl_r50_fpn_1x_coco.py']
model = dict(type='LD', ld_weight=0.25, ld_T=10,
             teacher_checkpoint=None)
