# RTMDet-x (reference configs/rtmdet/rtmdet_x_8xb16-300e_coco.py):
# deepen 1.33 / widen 1.25; same 300e recipe as -s.
_base_ = ['rtmdet_s_coco.py']
model = dict(deepen=1.33, widen=1.25)
