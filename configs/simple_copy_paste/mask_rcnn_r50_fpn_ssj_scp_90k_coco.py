# Mask R-CNN + Standard Scale Jittering + Simple Copy-Paste, 90k
# (reference configs/simple_copy_paste/
# mask-rcnn_r50_fpn_rpn-2conv_4conv1fc_syncbn-all_32xb2-ssj-scp-90k_coco.py
# over configs/common/ssj_scp_270k_coco-instance.py:25-46: RandomResize
# 1024^2 ratio (0.8, 1.25) -> RandomCrop absolute_range 1024 -> flip ->
# CopyPaste(max_num_pasted=100); 90k iters, steps at [81k, 85.5k, 87.75k],
# 4conv1fc bbox head). The reference's SyncBN-everything is a
# multi-GPU-BN artifact with no SPMD analogue (batch stats are sharded
# facts here); GN(32) heads stand in, matching the repo's gn family.
_base_ = ['../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py']
model = dict(
    head_norm='GN',
    bbox_head='Shared4Conv1FCBBoxHead',
)
train_dataloader = dict(pipeline=dict(
    scale=(1024, 1024),
    strong_aug=[
        dict(type='RandomRatioResize', scale=(1024, 1024),
             ratio_range=(0.8, 1.25)),
        dict(type='RandomCrop', crop_size=(1024, 1024),
             crop_type='absolute_range', allow_negative_crop=True),
        dict(type='CopyPaste', max_num_pasted=100),
    ]))
# 90k iters at the reference's 64-img global batch ~= 49 epochs on
# COCO-118k; expressed in this repo's epoch units with the same
# [0.9, 0.95, 0.975] milestone fractions.
train_cfg = dict(epochs=48)
optim = dict(milestones_epochs=(43, 45, 46))
