# GFL R101 + deformable conv C3-C5, ms-2x: published 47.1 AP (reference
# configs/gfl/gfl_r101-dconv-c3-c5_fpn_ms-2x_coco.py; its dcn block sets
# type='DCN' i.e. unmodulated sampling, although README note [3] labels
# the row dcnv2 — we match the config file).
_base_ = ['gfl_r50_fpn_ms2x_coco.py']
model = dict(depth=101,
             dcn_stages=(False, True, True, True),
             dcn_modulated=False)
