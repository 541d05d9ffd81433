# RTMDet-l (reference configs/rtmdet/rtmdet_l_8xb32-300e_coco.py):
# deepen 1.0 / widen 1.0; same 300e recipe as -s.
_base_ = ['rtmdet_s_coco.py']
model = dict(deepen=1.0, widen=1.0)
