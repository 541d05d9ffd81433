"""Config-reachable RetinaNet variants added for configs/ghm and
configs/efficientnet: the GHM-C/GHM-R loss switch
(reference mmdet/models/losses/ghm_loss.py + configs/ghm/) and the
EfficientNet stateful-BN backbone swap
(reference configs/efficientnet/retinanet_effb3_fpn_*)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from erd_tpu.apis import build_detector
from erd_tpu.config import Config
from tests.test_backbone_swap import _batch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_batch(h=64, w=96, seed=0):
    batch = _batch(h, w)
    batch['images'] = jnp.asarray(
        np.random.RandomState(seed).randint(0, 255, (1, h, w, 3), np.uint8))
    return batch


def test_ghm_config_reaches_ghm_loss():
    cfg = Config.fromfile(os.path.join(
        REPO, 'configs/ghm/retinanet_ghm_r50_fpn_1x_coco.py'))
    det = build_detector(cfg.model)
    assert det.train_cfg.loss_type == 'ghm'
    assert det.train_cfg.ghm_c_bins == 30
    assert det.train_cfg.bbox_weight == 10.0


def test_ghm_retina_loss_differs_from_focal_and_is_finite():
    from erd_tpu.models import RetinaNetDetector
    from erd_tpu.models.heads.retina_head import RetinaTrainConfig
    batch = _tiny_batch()
    ghm = RetinaNetDetector(num_classes=3, depth=18,
                            train_cfg=RetinaTrainConfig(loss_type='ghm'))
    variables = ghm.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    l_ghm = jax.jit(ghm.loss)(variables, batch)
    focal = RetinaNetDetector(num_classes=3, depth=18)
    l_foc = jax.jit(focal.loss)(variables, batch)
    for k in ('loss_cls', 'loss_bbox'):
        assert np.isfinite(float(l_ghm[k])), l_ghm
        assert float(l_ghm[k]) > 0
        assert abs(float(l_ghm[k]) - float(l_foc[k])) > 1e-6
    # GHM path must stay differentiable end to end
    def total(v):
        l = ghm.loss(v, batch)
        return l['loss_cls'] + l['loss_bbox']
    g = jax.jit(jax.grad(total))(variables)
    gsum = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(
        g['params']['bbox_head']))
    assert np.isfinite(gsum) and gsum > 0


def test_efficientnet_swap_trains_backbone_bn():
    from erd_tpu.models import RetinaNetDetector
    det = RetinaNetDetector(
        num_classes=3, sepbn=True,
        backbone=dict(type='EfficientNet', arch='b0',
                      out_indices=(2, 4, 6)),
        neck=dict(type='FPN', start_level=0, out_channels=64, num_outs=5,
                  add_extra_convs='on_input',
                  relu_before_extra_convs=True))
    variables = det.init(jax.random.PRNGKey(0), image_shape=(64, 96))
    # strides 8/16/32 out of the backbone (b0 channels 40/112/320)
    assert hasattr(det, 'loss_and_state')
    losses, consts = jax.jit(det.loss_and_state)(variables,
                                                 _tiny_batch(seed=1))
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, losses)
    # EfficientNet BN running stats MOVE under the stateful protocol
    # (unlike the frozen-stats ResNet host) — configs/efficientnet parity
    old = variables['batch_stats']['backbone']['stem']['bn']['mean']
    new = consts['batch_stats']['backbone']['stem']['bn']['mean']
    assert float(jnp.abs(new - old).sum()) > 0


def test_efficientnet_config_builds_and_abstract_inits():
    cfg = Config.fromfile(os.path.join(
        REPO, 'configs/efficientnet/'
        'retinanet_effb3_fpn_8xb4-crop896-1x_coco.py'))
    det = build_detector(cfg.model)
    shapes = jax.eval_shape(
        lambda rng: det.init(rng, image_shape=(64, 96)),
        jax.random.PRNGKey(0))
    assert 'batch_stats' in shapes  # train-time BN present
