# YOLOX-x (reference configs/yolox/yolox_x_8xb8-300e_coco.py):
# deepen 1.33 / widen 1.25; same 300e strong-aug recipe as -s.
_base_ = ['yolox_s_coco.py']
model = dict(deepen=1.33, widen=1.25)
