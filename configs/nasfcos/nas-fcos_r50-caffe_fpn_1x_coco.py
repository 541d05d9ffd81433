# NAS-FCOS (reference configs/nas_fcos/nas-fcos_r50-caffe_fpn_..._coco.py).
_base_ = '../fcos/fcos_r50_fpn_1x_coco.py'
model = dict(type='NASFCOS')
