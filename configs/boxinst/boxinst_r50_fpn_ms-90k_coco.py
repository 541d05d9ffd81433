# BoxInst (reference configs/boxinst/boxinst_r50_fpn_ms-90k_coco.py).
_base_ = '../condinst/condinst_r50_fpn_1x_coco.py'
model = dict(type='BoxInst',
             train_cfg=dict(pairwise_size=3, pairwise_dilation=2,
                            pairwise_color_thresh=0.3))
