# GeneralizedAttention '1111' plugin on stages c4-c5 (reference
# configs/empirical_attention/faster-rcnn_r50-attn1111_fpn_1x_coco.py).
_base_ = '../gfl/gfl_r50_fpn_1x_coco.py'
model = dict(gen_attention_stages=[False, False, True, True])
