# SABL RetinaNet R50-FPN with GN towers
# (reference configs/sabl/sabl-retinanet_r50-gn_fpn_1x_coco.py).
_base_ = ['./sabl_retinanet_r50_fpn_1x_coco.py']
model = dict(head_norm='GN')
