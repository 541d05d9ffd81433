# YOLOX-m (reference configs/yolox/yolox_m_8xb8-300e_coco.py):
# deepen 0.67 / widen 0.75; same 300e strong-aug recipe as -s.
_base_ = ['yolox_s_coco.py']
model = dict(deepen=0.67, widen=0.75)
