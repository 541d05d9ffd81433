# NAS-FPN: the searched feature-pyramid topology over C3-C5, 7 stacked
# merge cells (reference configs/nas_fpn/retinanet_r50_nasfpn_crop640-50e_coco.py).
_base_ = './retinanet_r50_fpn_crop640-50e_coco.py'
model = dict(neck=dict(type='NASFPN', start_level=1, out_channels=256,
                       stack_times=7))
