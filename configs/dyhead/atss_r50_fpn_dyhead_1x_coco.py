# DyHead: ATSS with 6 stacked scale/spatial/task-attention blocks on top
# of the FPN (reference configs/dyhead/atss_r50_fpn_dyhead_1x_coco.py;
# the reference chains neck=[FPN, DyHead] the same way).
_base_ = '../atss/atss_r50_fpn_1x_coco.py'
model = dict(neck=[
    dict(type='FPN', start_level=1, add_extra_convs='on_output',
         num_outs=5, out_channels=256),
    dict(type='DyHead', num_blocks=6, out_channels=256),
])
