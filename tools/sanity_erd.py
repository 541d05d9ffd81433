#!/usr/bin/env python
"""ERD incremental-learning sanity: demonstrate that Elastic Response
Distillation preserves old-class detection when training on new-class-only
data — the framework's core thesis — on synthetic data, on device.

Protocol:
  stage 1: train a 2-class GFL teacher on images containing classes {0, 1}.
  stage 2: train a 3-class ERD student ONLY on class-2 images (labels are
           0-based over the single new class), distilling from the teacher.
  ablation: same stage 2 with dist_loss_weight = 0 (no distillation).
  eval:    mixed images with all three classes; compare old-class AP.

Usage: python tools/sanity_erd.py [stage1_steps] [stage2_steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

COLORS = [(255, 40, 40), (40, 255, 40), (40, 40, 255)]


def make_records(n, classes, h=128, w=192, seed=0, id_base=0,
                 annotate=None):
    """Images with one rectangle per listed class.

    ``annotate``: restrict ANNOTATIONS to these classes while all listed
    classes still appear as pixels — the incremental-detection setting
    (new-task images contain unannotated old-class objects, which is what
    gives ERS something real to distill).
    """
    from erd_tpu.data.coco import ImageRecord
    rs = np.random.RandomState(seed)
    annotate = set(annotate if annotate is not None else classes)
    records, images = [], {}
    for i in range(n):
        img = np.full((h, w, 3), 120, np.uint8)
        boxes, labels = [], []
        for c in classes:
            bw = rs.randint(30, 60)
            bh = rs.randint(25, 50)
            x1 = rs.randint(0, w - bw)
            y1 = rs.randint(0, h - bh)
            img[y1:y1 + bh, x1:x1 + bw] = COLORS[c]
            if c in annotate:
                boxes.append([x1, y1, x1 + bw, y1 + bh])
                labels.append(c)
        rid = id_base + i
        records.append(ImageRecord(
            img_id=rid, path='', width=w, height=h,
            bboxes=np.asarray(boxes, np.float32).reshape(-1, 4),
            labels=np.asarray(labels, np.int32),
            ignore=np.zeros(len(boxes), bool)))
        images[rid] = img
    return records, images


def to_batch(records, images, label_offset=0):
    import jax
    import jax.numpy as jnp
    from erd_tpu.structures import GTInstances, ImageMeta
    gts, metas, imgs = [], [], []
    for r in records:
        gts.append(GTInstances.pad(r.bboxes, r.labels - label_offset, 8))
        metas.append(ImageMeta.make((r.height, r.width),
                                    (r.height, r.width), (1.0, 1.0),
                                    img_id=r.img_id))
        imgs.append(images[r.img_id])
    return dict(images=jnp.asarray(np.stack(imgs)),
                gt=jax.tree.map(lambda *x: jnp.stack(x), *gts),
                meta=jax.tree.map(lambda *x: jnp.stack(x), *metas))


def train(det, variables, batch, steps, lr=0.02, teacher=None):
    import jax
    from erd_tpu.engine import sgd_optimizer, warmup_multistep
    tx = sgd_optimizer(warmup_multistep(lr, 50), momentum=0.9,
                       weight_decay=1e-4, frozen_stages=-1, grad_clip=35.0)
    params = variables['params']
    consts = {k: v for k, v in variables.items() if k != 'params'}
    opt_state = jax.jit(tx.init)(params)

    @jax.jit
    def step(p, s):
        def loss_fn(pp):
            v = {'params': pp, **consts}
            losses = det.loss(v, batch, teacher_variables=teacher) \
                if teacher is not None else det.loss(v, batch)
            return sum(jax.tree.leaves(losses)), losses

        (_, losses), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        u, s2 = tx.update(g, s, p)
        return jax.tree.map(lambda a, x: a + x, p, u), s2, losses

    for i in range(steps):
        params, opt_state, losses = step(params, opt_state)
        if (i + 1) % 100 == 0:
            print(f'  step {i + 1}: ' + ' '.join(
                f'{k}={float(v):.3f}' for k, v in losses.items()))
    return {'params': params, **consts}


def classwise_ap(det, variables, records, images, num_classes):
    import numpy as np
    from erd_tpu.evaluation import CocoMAPEvaluator, DetectionResult
    batch = to_batch(records, images)
    res = det.predict_jit(variables, batch)
    ev = CocoMAPEvaluator(records, num_classes,
                          class_names=[str(i) for i in range(num_classes)])
    for i, r in enumerate(records):
        m = np.asarray(res.mask[i])
        ev.process(DetectionResult(
            img_id=r.img_id, bboxes=np.asarray(res.bboxes[i])[m],
            scores=np.asarray(res.scores[i])[m],
            labels=np.asarray(res.labels[i])[m]))
    return ev.compute(classwise=True)


def main():
    s1 = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    s2 = int(sys.argv[2]) if len(sys.argv) > 2 else 250
    import jax
    from erd_tpu.models import ERDConfig, ERDDetector, GFLDetector

    t0 = time.time()
    old_recs, old_imgs = make_records(8, [0, 1], seed=0)
    # new-task images contain old-class objects too, but only class 2 is
    # annotated — the incremental COCO category-split setting.
    new_recs, new_imgs = make_records(8, [0, 1, 2], seed=1, id_base=100,
                                      annotate=[2])
    mix_recs, mix_imgs = make_records(8, [0, 1, 2], seed=2, id_base=200)

    print(f'== stage 1: teacher on old classes ({s1} steps)')
    teacher_det = GFLDetector(num_classes=2, depth=18)
    t_vars = teacher_det.init(jax.random.PRNGKey(0), image_shape=(128, 192))
    t_vars = train(teacher_det, t_vars, to_batch(old_recs, old_imgs), s1)
    t_metrics = classwise_ap(teacher_det, t_vars,
                             [r for r in mix_recs], mix_imgs, 2)
    print(f"teacher on mixed images: old-class AP "
          f"{np.nanmean([t_metrics['classwise']['0'], t_metrics['classwise']['1']]):.3f}")

    print(f'== stage 2: ERD student on NEW-class-only data ({s2} steps)')

    def run_stage2(dist_w):
        det = ERDDetector(num_classes=3, depth=18,
                          erd=ERDConfig(ori_num_classes=2,
                                        dist_loss_weight=dist_w,
                                        ers_reg_cap=256))
        sv = det.init_student_from_teacher(jax.random.PRNGKey(1), t_vars,
                                           image_shape=(128, 192))
        sv = train(det, sv, to_batch(new_recs, new_imgs, label_offset=2),
                   s2, lr=0.01, teacher=t_vars)
        return det, sv

    det_erd, v_erd = run_stage2(1.0)
    print('== ablation: stage 2 WITHOUT distillation')
    det_abl, v_abl = run_stage2(0.0)

    m_erd = classwise_ap(det_erd, v_erd, mix_recs, mix_imgs, 3)
    m_abl = classwise_ap(det_abl, v_abl, mix_recs, mix_imgs, 3)
    old_erd = np.nanmean([m_erd['classwise']['0'], m_erd['classwise']['1']])
    old_abl = np.nanmean([m_abl['classwise']['0'], m_abl['classwise']['1']])
    print(f'elapsed {time.time() - t0:.0f}s')
    print(f"with ERD distill : old-class AP {old_erd:.3f}  "
          f"new-class AP {m_erd['classwise']['2']:.3f}  "
          f"mAP {m_erd['bbox_mAP']:.3f}")
    print(f"no distillation  : old-class AP {old_abl:.3f}  "
          f"new-class AP {m_abl['classwise']['2']:.3f}  "
          f"mAP {m_abl['bbox_mAP']:.3f}")
    assert old_erd > old_abl + 0.1, (
        'ERD sanity FAILED: distillation did not preserve old classes '
        f'({old_erd:.3f} vs {old_abl:.3f} without)')
    print('ERD SANITY OK: distillation preserves old-class detection '
          f'(+{old_erd - old_abl:.3f} AP over no-distill)')


if __name__ == '__main__':
    main()
