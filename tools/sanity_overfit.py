#!/usr/bin/env python
"""Sanity: overfit a small detector on a handful of synthetic images and
verify the evaluated mAP becomes high — a full-stack functional proof
(assignment -> losses -> SGD -> predict -> NMS -> COCO evaluator).

Usage: python tools/sanity_overfit.py [steps] [model]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def make_dataset(n=8, h=128, w=192, num_classes=3, seed=0):
    """Images with colored rectangles on gray; class = which color."""
    from erd_tpu.data.coco import ImageRecord
    rs = np.random.RandomState(seed)
    colors = [(255, 40, 40), (40, 255, 40), (40, 40, 255)]
    records, images = [], {}
    for i in range(n):
        img = np.full((h, w, 3), 120, np.uint8)
        k = rs.randint(1, 3)
        boxes, labels = [], []
        for _ in range(k):
            bw = rs.randint(30, 70)
            bh = rs.randint(25, 60)
            x1 = rs.randint(0, w - bw)
            y1 = rs.randint(0, h - bh)
            c = rs.randint(num_classes)
            img[y1:y1 + bh, x1:x1 + bw] = colors[c]
            boxes.append([x1, y1, x1 + bw, y1 + bh])
            labels.append(c)
        records.append(ImageRecord(
            img_id=i, path='', width=w, height=h,
            bboxes=np.asarray(boxes, np.float32),
            labels=np.asarray(labels, np.int32),
            ignore=np.zeros(len(boxes), bool)))
        images[i] = img
    return records, images


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    import jax
    import jax.numpy as jnp

    from erd_tpu.engine import sgd_optimizer, warmup_multistep
    from erd_tpu.evaluation import CocoMAPEvaluator, DetectionResult
    from erd_tpu.models import GFLDetector
    from erd_tpu.structures import GTInstances, ImageMeta

    h, w, n, c = 128, 192, 8, 3
    records, images = make_dataset(n, h, w, c)
    det = GFLDetector(num_classes=c, depth=18)
    variables = det.init(jax.random.PRNGKey(0), image_shape=(h, w))

    # one static batch containing the whole dataset
    gts = [GTInstances.pad(r.bboxes, r.labels, 8) for r in records]
    metas = [ImageMeta.make((h, w), (h, w), (1.0, 1.0), img_id=r.img_id)
             for r in records]
    batch = dict(
        images=jnp.asarray(np.stack([images[i] for i in range(n)])),
        gt=jax.tree.map(lambda *x: jnp.stack(x), *gts),
        meta=jax.tree.map(lambda *x: jnp.stack(x), *metas))

    tx = sgd_optimizer(warmup_multistep(0.02, 50), momentum=0.9,
                       weight_decay=1e-4, frozen_stages=-1, grad_clip=35.0)
    params = variables['params']
    consts = {k: v for k, v in variables.items() if k != 'params'}
    opt_state = jax.jit(tx.init)(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            losses = det.loss({'params': p, **consts}, batch)
            return sum(jax.tree.leaves(losses)), losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        upd, opt_state2 = tx.update(grads, opt_state, params)
        return jax.tree.map(lambda a, u: a + u, params, upd), opt_state2, \
            losses

    t0 = time.time()
    for i in range(steps):
        params, opt_state, losses = step(params, opt_state)
        if (i + 1) % 50 == 0:
            print(f'step {i + 1}: ' + ' '.join(
                f'{k}={float(v):.3f}' for k, v in losses.items()))
    print(f'trained {steps} steps in {time.time() - t0:.1f}s')

    res = det.predict_jit({'params': params, **consts}, batch)
    ev = CocoMAPEvaluator(records, c)
    for i in range(n):
        m = np.asarray(res.mask[i])
        ev.process(DetectionResult(
            img_id=i, bboxes=np.asarray(res.bboxes[i])[m],
            scores=np.asarray(res.scores[i])[m],
            labels=np.asarray(res.labels[i])[m]))
    metrics = ev.compute()
    print({k: round(v, 3) for k, v in metrics.items()
           if isinstance(v, float)})
    assert metrics['bbox_mAP_50'] > 0.8, \
        f'overfit sanity FAILED: mAP@0.5 = {metrics["bbox_mAP_50"]:.3f}'
    print('SANITY OK: detector overfits synthetic data '
          f'(mAP@0.5 = {metrics["bbox_mAP_50"]:.3f})')


if __name__ == '__main__':
    main()
