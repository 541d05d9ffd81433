# CentripetalNet (reference configs/centripetalnet/*mstest_coco.py).
_base_ = '../cornernet/cornernet_hourglass104_8xb6-210e-mstest_coco.py'
model = dict(type='CentripetalNet')
