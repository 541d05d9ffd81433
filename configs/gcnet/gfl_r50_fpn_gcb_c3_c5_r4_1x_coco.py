# GCNet ContextBlock plugin on stages c3-c5, ratio 1/4 (reference
# configs/gcnet/*_r4_* family; applied to the GFL flagship here — the
# plugin rides any ResNet-backed detector via context_block_stages).
_base_ = '../gfl/gfl_r50_fpn_1x_coco.py'
model = dict(context_block_stages=[False, True, True, True],
             context_block_ratio=0.25)
