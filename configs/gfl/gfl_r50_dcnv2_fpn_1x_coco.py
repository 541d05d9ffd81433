# GFL R50 + DCNv2 stages 2-4 (reference configs/gfl/README.md:22 family:
# r101-dcnv2 ms-2x publishes 47.1 AP; dcn plugin at mmdet resnet.py:134,
# stage_with_dcn=(False, True, True, True)).
_base_ = ['./gfl_r50_fpn_1x_coco.py']
model = dict(dcn_stages=(False, True, True, True))
