# GFL R50 with DCNv1 (dconv) in C3-C5 — the configs/dcn family pattern
# (reference configs/dcn/*dconv* set dcn=dict(type='DCN'), the UNmodulated
# sampler; the modulated family lives in configs/dcnv2 and
# configs/gfl/gfl_r50_dcnv2_fpn_1x_coco.py).
_base_ = ['../gfl/gfl_r50_fpn_1x_coco.py']
model = dict(dcn_stages=(False, True, True, True), dcn_modulated=False)
