# RTMDet-Ins-x (reference configs/rtmdet/rtmdet-ins_x_8xb16-300e_coco.py).
_base_ = ['rtmdet_ins_s_coco.py']
model = dict(deepen=1.33, widen=1.25)
