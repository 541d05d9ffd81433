# PISA SSD300 (reference configs/pisa/ssd300_pisa_coco.py).
_base_ = '../ssd/ssd300_coco.py'
model = dict(type='PISASSD',
             train_cfg=dict(isr=dict(k=2.0, bias=0.0),
                            carl=dict(k=1.0, bias=0.2)))
optim = dict(grad_clip=35.0)
