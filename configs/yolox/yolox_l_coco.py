# YOLOX-l (reference configs/yolox/yolox_l_8xb8-300e_coco.py):
# deepen 1.0 / widen 1.0; same 300e strong-aug recipe as -s.
_base_ = ['yolox_s_coco.py']
model = dict(deepen=1.0, widen=1.0)
