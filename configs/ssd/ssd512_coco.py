# SSD512 (reference configs/ssd/ssd512_coco.py): 7 levels, strides
# 8..512, basesize ratio range (0.1, 0.9), extra s2 pair + final 4x4 conv.
_base_ = ['./ssd300_coco.py']
model = dict(input_size=512)
train_dataloader = dict(pipeline=dict(scale=(512, 512)))
val_dataloader = dict(pipeline=dict(scale=(512, 512)))
test_dataloader = dict(pipeline=dict(scale=(512, 512)))
