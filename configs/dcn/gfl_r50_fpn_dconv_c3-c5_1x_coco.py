# GFL R50 with DCNv2 in C3-C5 (reference configs/dcn/ pattern +
# configs/gfl/gfl_r101_fpn_dconv_c3-c5_ms-2x_coco.py:22 — the strongest
# published GFL family rides deformable stages).
_base_ = ['../gfl/gfl_r50_fpn_1x_coco.py']
model = dict(dcn_stages=(False, True, True, True))
