# FreeAnchor (reference configs/free_anchor/freeanchor_r50_fpn_1x_coco.py).
_base_ = '../retinanet/retinanet_r50_fpn_1x_coco.py'
model = dict(type='FreeAnchor',
             train_cfg=dict(pre_anchor_topk=50, bbox_thr=0.6))
optim_wrapper = dict(clip_grad=dict(max_norm=35, norm_type=2))
