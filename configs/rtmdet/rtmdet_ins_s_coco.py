# RTMDet-Ins-s (reference configs/rtmdet/rtmdet-ins_s_8xb32-300e_coco.py):
# the RTMDet-s box pipeline plus the dynamic-conv instance-mask branch
# (with_mask annotations, DiceLoss w=2.0).
_base_ = ['./rtmdet_s_coco.py']
model = dict(type='RTMDetIns',
             test_cfg=dict(mask_thr_binary=0.5))
