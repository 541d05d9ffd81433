# VFNet R50 + mdconv c3-c5 ms-2x (reference configs/vfnet/
# vfnet_r50-mdconv-c3-c5_fpn_ms-2x_coco.py: backbone DCNv2 at stages 2-4).
_base_ = ['vfnet_r50_fpn_ms2x_coco.py']
model = dict(dcn_stages=[False, True, True, True])
