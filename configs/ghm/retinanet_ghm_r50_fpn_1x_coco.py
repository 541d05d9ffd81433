# GHM: gradient-harmonizing classification + regression losses on
# RetinaNet (reference configs/ghm/retinanet_ghm_r50_fpn_1x_coco.py:
# GHMC bins=30 momentum=0.75, GHMR mu=0.02 bins=10 loss_weight=10).
# The jax GHM losses re-bin per step (no cross-step EMA of bin counts);
# see erd_tpu/losses/extra.py.
_base_ = '../retinanet/retinanet_r50_fpn_1x_coco.py'
model = dict(
    train_cfg=dict(loss_type='ghm', ghm_c_bins=30, ghm_r_bins=10,
                   ghm_mu=0.02, cls_weight=1.0, bbox_weight=10.0))
