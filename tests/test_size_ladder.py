"""YOLOX / RTMDet size-ladder (deepen/widen) threading.

The reference ships tiny/s/m/l/x recipes per family
(reference/configs/yolox/yolox_{tiny,s,m,l,x}_8xb8-300e_coco.py,
reference/configs/rtmdet/rtmdet{,-ins}_{tiny,s,m,l,x}_8xb32-300e_coco.py)
by scaling deepen_factor/widen_factor. These tests pin (a) that the -s
default param tree is UNCHANGED by the ladder plumbing (widths and block
counts identical to the pre-ladder hardwired layout) and (b) that the
m/l factors actually scale widths and repeat counts.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from erd_tpu.config import Config


def _width(params, path):
    node = params
    for k in path:
        node = node[k]
    return node.shape[-1]


def test_yolox_s_default_layout_unchanged():
    from erd_tpu.models.detectors.yolox import YOLOXDetector
    det = YOLOXDetector(num_classes=4)
    assert (det.deepen, det.widen) == (0.33, 0.5)
    v = det.init(jax.random.PRNGKey(0), image_shape=(64, 64))
    p = v['params']
    # head width 128 = max(int(256 * 0.5), 16); PAFPN csp block count 1
    assert _width(p, ('bbox_head', 'stem_0', 'conv', 'kernel')) == 128
    assert 'block0' in p['neck']['td_csp1']
    assert 'block1' not in p['neck']['td_csp1']


def test_yolox_m_scales_width_and_depth():
    from erd_tpu.models.detectors.yolox import YOLOXDetector
    det = YOLOXDetector(num_classes=4, deepen=0.67, widen=0.75)
    v = det.init(jax.random.PRNGKey(0), image_shape=(64, 64))
    p = v['params']
    # head width 192 = int(256 * 0.75); round(3 * 0.67) = 2 csp blocks
    assert _width(p, ('bbox_head', 'stem_0', 'conv', 'kernel')) == 192
    assert 'block1' in p['neck']['td_csp1']
    assert 'block2' not in p['neck']['td_csp1']


def test_rtmdet_l_scales_width_and_depth():
    from erd_tpu.models.detectors.rtmdet import RTMDetDetector
    det = RTMDetDetector(num_classes=4, deepen=1.0, widen=1.0)
    v = det.init(jax.random.PRNGKey(0), image_shape=(64, 64))
    p = v['params']
    # c3 = 256 at widen 1.0 -> neck/head width 256; 3 csp blocks
    assert _width(p, ('neck', 'out_conv0', 'conv', 'kernel')) == 256
    assert 'block2' in p['neck']['td_csp1']
    out = det.forward_jit(v, jnp.zeros((1, 64, 64, 3), jnp.uint8))
    assert out[0][0].shape[-1] == 4  # cls logits per level


def test_rtmdet_tiny_builds_from_config():
    cfg = Config.fromfile('configs/rtmdet/rtmdet_tiny_coco.py')
    from erd_tpu.apis.build import build_detector
    det = build_detector(cfg['model'])
    assert (det.deepen, det.widen) == (0.167, 0.375)
    v = det.init(jax.random.PRNGKey(0), image_shape=(64, 64))
    # stem0 = w(64)//2 = max(int(64*0.375),16)//2 = 12 -> max(...)=24//2=12
    assert _width(v['params'],
                  ('backbone', 'stem0', 'conv', 'kernel')) == 12


def test_yolox_ladder_configs_build():
    from erd_tpu.apis.build import build_detector
    for name, dw in (('yolox_m', (0.67, 0.75)), ('yolox_l', (1.0, 1.0)),
                     ('yolox_x', (1.33, 1.25)),
                     ('yolox_tiny', (0.33, 0.375))):
        cfg = Config.fromfile(f'configs/yolox/{name}_coco.py')
        det = build_detector(cfg['model'])
        assert (det.deepen, det.widen) == dw, name
