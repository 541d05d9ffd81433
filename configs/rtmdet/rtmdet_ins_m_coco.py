# RTMDet-Ins-m (reference configs/rtmdet/rtmdet-ins_m_8xb32-300e_coco.py).
_base_ = ['rtmdet_ins_s_coco.py']
model = dict(deepen=0.67, widen=0.75)
