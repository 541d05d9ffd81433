#!/usr/bin/env python
"""Measure host input-pipeline overlap against the fused ERD train step.

VERDICT round-3 weak #3: the bench.py number times a pre-packed synthetic
batch, so the real cv2 decode/resize/pack cost at 800x1344 was unmeasured.
This tool answers it on the real chip:

  1. generates COCO-sized JPEGs on disk (landscape, ~640x427, textured so
     JPEG decode cost is realistic, boxes + labels in COCO json),
  2. times the loader ALONE (DetDataLoader: threaded decode + bucket-pad +
     prefetch queue), and
  3. times the OVERLAPPED loop — loader feeding the same donated jitted ERD
     teacher+student train step bench.py times on synthetic batches —
     so the delta to bench.py's number IS the un-hidden input cost.

Usage: python tools/bench_loader_overlap.py [batch] [n_images] [root]
Prints one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def gen_dataset(root, n=96, seed=0):
    """COCO-shaped synthetic JPEGs: textured background + colored boxes."""
    import cv2
    rs = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, 'train'), exist_ok=True)
    os.makedirs(os.path.join(root, 'annotations'), exist_ok=True)
    images, anns, aid = [], [], 1
    for i in range(1, n + 1):
        w, h = 640, 427  # COCO-typical landscape
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack([
            (127 + 100 * np.sin(xx / (17. + (i % 7)))),
            (127 + 100 * np.sin(yy / (23. + (i % 5)))),
            (127 + 100 * np.sin((xx + yy) / 31.)),
        ], axis=-1)
        img += rs.randint(-16, 16, img.shape)  # defeats trivial JPEG runs
        img = np.clip(img, 0, 255).astype(np.uint8)
        for _ in range(rs.randint(2, 9)):
            bw, bh = rs.randint(40, 200), rs.randint(40, 160)
            x1, y1 = rs.randint(0, w - bw), rs.randint(0, h - bh)
            c = rs.randint(2)
            img[y1:y1 + bh, x1:x1 + bw, c] = 230
            anns.append({'id': aid, 'image_id': i, 'category_id': c + 1,
                         'bbox': [int(x1), int(y1), int(bw), int(bh)],
                         'area': int(bw * bh), 'iscrowd': 0})
            aid += 1
        cv2.imwrite(os.path.join(root, 'train', f'{i}.jpg'), img)
        images.append({'id': i, 'file_name': f'{i}.jpg',
                       'width': w, 'height': h})
    with open(os.path.join(root, 'annotations', 'train.json'), 'w') as f:
        json.dump({'images': images, 'annotations': anns,
                   'categories': [{'id': 1, 'name': 'a'},
                                  {'id': 2, 'name': 'b'}]}, f)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_images = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    root = sys.argv[3] if len(sys.argv) > 3 else '/tmp/overlap_bench'

    gen_dataset(root, n_images)

    from erd_tpu.data import (CocoDataset, DetDataLoader, DetPipeline,
                              LoaderConfig)

    ds = CocoDataset(os.path.join(root, 'annotations', 'train.json'),
                     img_prefix=os.path.join(root, 'train'),
                     classes=('a', 'b'), min_size=8)
    pipe = DetPipeline(scale=(1333, 800), flip_prob=0.5, max_gt=24)
    loader = DetDataLoader(ds, pipe, LoaderConfig(
        batch_size=batch, num_workers=8, prefetch=2, seed=0))

    # --- loader alone -----------------------------------------------------
    from erd_tpu.utils import DataLoaderBenchmark
    lres = DataLoaderBenchmark(loader, num_warmup=1, max_iter=12).run()

    # --- overlapped ERD train loop (same step bench.py times) --------------
    import jax
    import jax.numpy as jnp
    from functools import partial
    from erd_tpu.engine import sgd_optimizer, warmup_multistep
    from erd_tpu.models import ERDConfig, ERDDetector

    from erd_tpu.data.transforms import bucket_shape
    h, w = bucket_shape(427, 640, scale=(1333, 800))  # landscape canvas
    det = ERDDetector(num_classes=80, depth=50,
                      erd=ERDConfig(ori_num_classes=40, num_devices=1),
                      compute_dtype=jnp.bfloat16)
    teacher = det.teacher.init(jax.random.PRNGKey(1), image_shape=(h, w))
    student = det.init_student_from_teacher(jax.random.PRNGKey(2), teacher,
                                            image_shape=(h, w))
    tx = sgd_optimizer(warmup_multistep(0.01, 500), frozen_stages=1)
    params = student['params']
    consts = {k: v for k, v in student.items() if k != 'params'}
    opt_state = jax.jit(tx.init)(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch):
        def loss_fn(p):
            losses = det.loss({'params': p, **consts}, batch,
                              teacher_variables=teacher)
            return sum(jax.tree.leaves(losses))

        grads = jax.grad(loss_fn)(params)
        updates, new_state = tx.update(grads, opt_state, params)
        return (jax.tree.map(lambda a, u: a + u, params, updates), new_state)

    warmup, timed_steps, t0 = 3, 0, None
    steps_per_epoch = loader.steps_per_epoch(0)
    target = warmup + max(10, steps_per_epoch)
    step_i = 0
    epoch = 0
    done = False
    while not done:
        for b in loader.epoch(epoch):
            # all generated images are landscape, so every batch should
            # land on the (h, w) bucket the step was compiled for; skip
            # (rather than crash) if a future gen_dataset change adds
            # portrait aspect ratios
            if b['images'].shape[1:3] != (h, w):
                continue
            params, opt_state = train_step(params, opt_state, b)
            step_i += 1
            if step_i == warmup:
                jax.block_until_ready(params)
                t0 = time.perf_counter()
            if step_i >= target:
                jax.block_until_ready(params)
                timed_steps = step_i - warmup
                done = True
                break
        epoch += 1
    dt = time.perf_counter() - t0
    overlapped = batch * timed_steps / dt

    print(json.dumps({
        'loader_only_img_s': round(lres.fps, 1),
        'overlapped_train_img_s_chip': round(overlapped, 2),
        'timed_steps': timed_steps,
        'batch': batch,
        'canvas': [h, w],
        'note': 'compare overlapped_train_img_s_chip to bench.py synthetic '
                'number: the gap is un-hidden host input cost',
    }))


if __name__ == '__main__':
    main()
