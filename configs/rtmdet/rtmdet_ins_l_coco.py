# RTMDet-Ins-l (reference configs/rtmdet/rtmdet-ins_l_8xb32-300e_coco.py).
_base_ = ['rtmdet_ins_s_coco.py']
model = dict(deepen=1.0, widen=1.0)
