#!/usr/bin/env python
"""Package a trained detector for serving: AOT-export the jitted predict.

TPU-native counterpart of
/root/reference/tools/deployment/mmdet2torchserve.py. Instead of a
TorchServe `.mar`, the serving artifact is a directory holding

- ``predict.jaxexport`` — the serialized StableHLO of
  ``predict(variables, batch)`` via ``jax.export`` (loadable with
  ``jax.export.deserialize`` on any machine with a compatible backend,
  no erd_tpu import needed at serving time),
- ``variables.ckpt/`` — the orbax checkpoint of the weights,
- ``model.json`` — name/version/config/input-spec metadata.

The export is shape-specialized (XLA compiles static shapes); pass
``--shape H W`` (+ ``--batch``) matching the serving-side padded canvas.

Usage:
    python tools/deployment/export_model.py CONFIG CHECKPOINT OUTDIR \
        --shape 800 1344 --batch 1 [--name my_model --version 1.0]

Smoke-tested in tests/test_deployment.py (serialize -> deserialize ->
call on a new process's devices).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import jax
import jax.numpy as jnp
import numpy as np


def export_model(config_file, checkpoint, outdir, shape=(800, 1344),
                 batch=1, name=None, version='1.0'):
    from erd_tpu.apis.inference import init_detector
    from erd_tpu.engine.checkpoints import save_checkpoint
    from erd_tpu.structures.det_sample import ImageMeta

    det, variables, cfg = init_detector(config_file, checkpoint)
    h, w = shape

    example = dict(
        images=jnp.zeros((batch, h, w, 3), jnp.uint8),
        img_shape=jnp.asarray([[h, w]] * batch, jnp.float32),
        ori_shape=jnp.asarray([[h, w]] * batch, jnp.float32),
        scale_factor=jnp.ones((batch, 2), jnp.float32))

    # the export boundary speaks PLAIN dicts/tuples only (custom pytree
    # types are not registered for jax.export serialization, and the
    # serving side shouldn't need erd_tpu classes anyway)
    def predict(variables, inp):
        meta = ImageMeta(
            img_shape=inp['img_shape'], ori_shape=inp['ori_shape'],
            scale_factor=inp['scale_factor'],
            flip=jnp.zeros((batch,), bool),
            img_id=jnp.zeros((batch,), jnp.int32),
            valid=jnp.ones((batch,), bool))
        res = det.predict(variables,
                          {'images': inp['images'], 'meta': meta},
                          rescale=True)
        leaves = jax.tree.leaves(res)
        if hasattr(res, 'bboxes'):  # standard DetResults
            return dict(bboxes=res.bboxes, scores=res.scores,
                        labels=res.labels, mask=res.mask)
        return tuple(leaves)

    exported = jax.export.export(jax.jit(predict))(variables, example)
    blob = exported.serialize()

    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, 'predict.jaxexport'), 'wb') as f:
        f.write(blob)
    save_checkpoint(os.path.join(outdir, 'variables.ckpt'), 0,
                    dict(variables=variables))
    with open(os.path.join(outdir, 'model.json'), 'w') as f:
        json.dump(dict(
            name=name or os.path.splitext(
                os.path.basename(str(config_file)))[0],
            version=version,
            config=str(config_file),
            input=dict(batch=batch, height=h, width=w,
                       layout='NHWC uint8'),
            platforms=list(exported.platforms)), f, indent=2)
    print(f'exported {len(blob)} bytes to {outdir} '
          f'(platforms={exported.platforms})')
    return outdir


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('outdir')
    p.add_argument('--shape', type=int, nargs=2, default=(800, 1344))
    p.add_argument('--batch', type=int, default=1)
    p.add_argument('--name', default=None)
    p.add_argument('--version', default='1.0')
    args = p.parse_args()
    export_model(args.config, args.checkpoint, args.outdir,
                 tuple(args.shape), args.batch, args.name, args.version)


if __name__ == '__main__':
    main()
