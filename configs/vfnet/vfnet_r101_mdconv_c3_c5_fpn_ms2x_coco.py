# VFNet R101 + mdconv c3-c5 ms-2x (reference configs/vfnet/
# vfnet_r101-mdconv-c3-c5_fpn_ms-2x_coco.py).
_base_ = ['vfnet_r50_mdconv_c3_c5_fpn_ms2x_coco.py']
model = dict(depth=101)
