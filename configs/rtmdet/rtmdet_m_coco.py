# RTMDet-m (reference configs/rtmdet/rtmdet_m_8xb32-300e_coco.py):
# deepen 0.67 / widen 0.75; same 300e recipe as -s.
_base_ = ['rtmdet_s_coco.py']
model = dict(deepen=0.67, widen=0.75)
