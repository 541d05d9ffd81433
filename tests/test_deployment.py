"""Serving-export roundtrip: jax.export the jitted predict, deserialize
the StableHLO blob, and run it — the TPU-native analogue of the
reference's tools/deployment/mmdet2torchserve.py packaging path."""
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, 'tools', 'deployment'))


def test_export_model_roundtrip(tmp_path):
    from export_model import export_model

    cfg = tmp_path / 'tiny_gfl.py'
    cfg.write_text(
        "model = dict(type='GFL', num_classes=4, depth=18)\n"
        "optim = dict(lr=0.01)\n"
        "train_cfg = dict(epochs=1)\n")
    outdir = str(tmp_path / 'served')
    export_model(str(cfg), None, outdir, shape=(64, 96), batch=1)

    assert os.path.exists(os.path.join(outdir, 'predict.jaxexport'))
    with open(os.path.join(outdir, 'model.json')) as f:
        info = json.load(f)
    assert info['input'] == {'batch': 1, 'height': 64, 'width': 96,
                             'layout': 'NHWC uint8'}

    # serving side: plain dicts only — no erd_tpu classes needed to CALL
    # the blob (weights come from the packaged checkpoint; the detector
    # is rebuilt here only as a convenient source of a weight pytree)
    with open(os.path.join(outdir, 'predict.jaxexport'), 'rb') as f:
        exported = jax.export.deserialize(f.read())
    from erd_tpu.apis.inference import init_detector
    _, variables, _ = init_detector(str(cfg))
    batch = dict(
        images=jnp.zeros((1, 64, 96, 3), jnp.uint8),
        img_shape=jnp.asarray([[64, 96]], jnp.float32),
        ori_shape=jnp.asarray([[64, 96]], jnp.float32),
        scale_factor=jnp.ones((1, 2), jnp.float32))
    res = exported.call(variables, batch)
    assert set(res) == {'bboxes', 'scores', 'labels', 'mask'}
    boxes = np.asarray(res['bboxes'])
    assert boxes.ndim == 3 and boxes.shape[0] == 1
    assert np.isfinite(boxes).all()
