# QueryInst (reference configs/queryinst/queryinst_r50_fpn_1x_coco.py).
_base_ = '../sparse_rcnn/sparse-rcnn_r50_fpn_1x_coco.py'
model = dict(type='QueryInst')
