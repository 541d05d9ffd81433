# TOOD R101 + dconv c3-c5 ms-2x (reference configs/tood/
# tood_r101-dconv-c3-c5_fpn_ms-2x_coco.py: backbone DCNv2 at stages 2-4).
_base_ = ['tood_r101_fpn_ms2x_coco.py']
model = dict(dcn_stages=[False, True, True, True])
