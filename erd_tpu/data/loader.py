"""Bucketed, prefetching detection data loader.

Host-side replacement for the reference's torch DataLoader stack (worker
processes + AspectRatioBatchSampler + DefaultSampler/DistSamplerSeedHook):

  * per-epoch deterministic shuffling from a seed (epoch folded in, matching
    DistSamplerSeedHook semantics);
  * indices are grouped by orientation bucket so every batch maps to one of
    the two static canvas shapes (no recompilation churn);
  * a thread pool decodes/resizes ahead of the training step and a small
    queue double-buffers batches (the torch `num_workers`/prefetch analogue —
    threads suffice because cv2 releases the GIL).
"""
from __future__ import annotations

import concurrent.futures as cf
import queue
import threading
from dataclasses import dataclass
from typing import Iterator, Optional

import jax
import numpy as np

from .coco import CocoDataset
from .transforms import DetPipeline


def _stack_tree(items):
    return jax.tree.map(lambda *xs: np.stack(xs), *items)


@dataclass
class LoaderConfig:
    batch_size: int = 8
    seed: int = 0
    num_workers: int = 8
    prefetch: int = 2
    drop_last: bool = True
    shuffle: bool = True
    # 'default' | 'class_aware' (reference samplers/class_aware_sampler.py
    # — LVIS long-tail recipe: round-robin over categories, then a random
    # image containing that category)
    sampler: str = 'default'
    num_sample_class: int = 1


class DetDataLoader:

    def __init__(self, dataset: CocoDataset, pipeline: DetPipeline,
                 cfg: LoaderConfig = LoaderConfig()):
        self.dataset = dataset
        self.pipeline = pipeline
        self.cfg = cfg
        # orientation groups (landscape w>=h vs portrait)
        self.groups = {0: [], 1: []}
        for i, r in enumerate(dataset.records):
            self.groups[0 if r.width >= r.height else 1].append(i)

    def _class_aware_indices(self, rs) -> np.ndarray:
        """ClassAwareSampler order: shuffle the category list, take
        ``num_sample_class`` images per category per round, cycling both
        category and per-category image iterators, until one epoch's worth
        of indices is drawn."""
        cat_to_imgs = {}
        for i, r in enumerate(self.dataset.records):
            for lab in np.unique(np.asarray(r.labels)):
                cat_to_imgs.setdefault(int(lab), []).append(i)
        cats = sorted(cat_to_imgs)
        if not cats:
            return np.arange(len(self.dataset.records))
        per_cat = {c: rs.permutation(v).tolist()
                   for c, v in cat_to_imgs.items()}
        cursors = {c: 0 for c in cats}
        out, n = [], len(self.dataset.records)
        cat_order = rs.permutation(cats).tolist()
        ci = 0
        while len(out) < n:
            if ci == len(cat_order):
                cat_order = rs.permutation(cats).tolist()
                ci = 0
            c = cat_order[ci]
            ci += 1
            for _ in range(self.cfg.num_sample_class):
                imgs = per_cat[c]
                if cursors[c] >= len(imgs):
                    rs.shuffle(imgs)
                    cursors[c] = 0
                out.append(imgs[cursors[c]])
                cursors[c] += 1
        return np.asarray(out[:n])

    def _batches_for_epoch(self, epoch: int):
        rs = np.random.RandomState(self.cfg.seed + epoch)
        if self.cfg.sampler == 'class_aware':
            order = self._class_aware_indices(rs)
            # keep orientation-homogeneous batches: route the class-aware
            # order through the same bucket split, preserving draw order
            groups = {0: [], 1: []}
            for i in order.tolist():
                r = self.dataset.records[i]
                groups[0 if r.width >= r.height else 1].append(i)
        else:
            groups = self.groups
        batches = []
        for g, idxs in groups.items():
            idxs = np.asarray(idxs)
            if self.cfg.shuffle and self.cfg.sampler != 'class_aware':
                rs.shuffle(idxs)
            nb = len(idxs) // self.cfg.batch_size
            for b in range(nb):
                batches.append(
                    idxs[b * self.cfg.batch_size:(b + 1) *
                         self.cfg.batch_size])
            if not self.cfg.drop_last and len(idxs) % self.cfg.batch_size:
                tail = idxs[nb * self.cfg.batch_size:]
                # pad the final batch by repeating its first item; the
                # repeated slots carry meta.valid=False downstream via img_id
                pad = np.concatenate(
                    [tail,
                     np.repeat(tail[:1],
                               self.cfg.batch_size - len(tail))])
                batches.append((pad, len(tail)))
        if self.cfg.shuffle:
            rs.shuffle(batches)
        return batches

    def steps_per_epoch(self, epoch: int = 0):
        return len(self._batches_for_epoch(epoch))

    def _make_batch(self, idxs, epoch, n_valid=None):
        imgs, gts, metas = [], [], []
        for j, i in enumerate(np.asarray(idxs).tolist()):
            rs = np.random.RandomState(
                (self.cfg.seed * 1000003 + epoch * 7919 + int(i)) %
                (2**31 - 1))
            canvas, gt, meta = self.pipeline(self.dataset[i], rs)
            if n_valid is not None and j >= n_valid:
                meta = meta.replace(valid=np.asarray(False),
                                    img_id=np.asarray(-1, np.int32))
            imgs.append(canvas)
            gts.append(gt)
            metas.append(meta)
        return dict(images=np.stack(imgs), gt=_stack_tree(gts),
                    meta=_stack_tree(metas))

    def epoch(self, epoch: int) -> Iterator[dict]:
        """Yield prefetched batches for one epoch.

        Worker exceptions (corrupt image, missing file, pipeline bug) are
        forwarded through the queue and re-raised in the consumer — the
        producer never dies without handing over either a batch, the
        exception, or the end-of-epoch sentinel, so the consumer can't
        block forever on ``q.get()``.
        """
        batches = self._batches_for_epoch(epoch)
        q: 'queue.Queue' = queue.Queue(maxsize=self.cfg.prefetch)
        stop = threading.Event()

        def put(item):
            # bounded put that aborts when the consumer has gone away,
            # so an abandoned iterator can't wedge the producer thread.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                # num_workers=0 means "no parallelism", not "no pool"
                with cf.ThreadPoolExecutor(
                        max(self.cfg.num_workers, 1)) as pool:
                    futs = []
                    for b in batches:
                        if stop.is_set():
                            return
                        if isinstance(b, tuple):
                            idxs, n_valid = b
                        else:
                            idxs, n_valid = b, None
                        futs.append(pool.submit(self._make_batch, idxs,
                                                epoch, n_valid))
                        while len(futs) >= self.cfg.prefetch + 1:
                            if not put(futs.pop(0).result()):
                                return
                    for f in futs:
                        if not put(f.result()):
                            return
                put(None)
            except BaseException as e:  # noqa: BLE001 — forwarded, re-raised
                put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


class SemiDataLoader:
    """Labeled + unlabeled multi-source batching for semi-supervised
    training (reference samplers/multi_source_sampler.py +
    soft_teacher.py data flow).

    Each step yields ``{'sup': <labeled batch>, 'unsup_weak': ...,
    'unsup_strong': ...}`` where the weak and strong unlabeled views
    SHARE geometry (same resize/flip — built once through the weak
    pipeline) and differ only photometrically via ``strong_photometric``
    applied to the weak canvas. This matches the SoftTeacher requirement
    that pseudo boxes from the weak view align pixel-for-pixel with the
    strong view.
    """

    def __init__(self, sup_loader: DetDataLoader,
                 unsup_dataset, unsup_pipeline,
                 strong_photometric=None, unsup_batch_size: int = None,
                 seed: int = 0):
        self.sup = sup_loader
        self.unsup_dataset = unsup_dataset
        self.unsup_pipeline = unsup_pipeline
        self.strong_photometric = strong_photometric
        self.unsup_batch_size = unsup_batch_size or \
            sup_loader.cfg.batch_size
        self.seed = seed
        self.cfg = sup_loader.cfg
        # the loader pipeline attribute lets PipelineSwitchHook swap it
        self.pipeline = sup_loader.pipeline

    def steps_per_epoch(self, epoch: int = 0):
        return self.sup.steps_per_epoch(epoch)

    def _unsup_batch(self, idxs, epoch):
        imgs, strong_imgs, gts, metas = [], [], [], []
        for i in idxs.tolist():
            rs = np.random.RandomState(
                (self.seed * 999983 + epoch * 6007 + int(i)) % (2**31 - 1))
            canvas, gt, meta = self.unsup_pipeline(self.unsup_dataset[i],
                                                   rs)
            imgs.append(canvas)
            if self.strong_photometric is not None:
                strong_imgs.append(self.strong_photometric(canvas, rs))
            else:
                strong_imgs.append(canvas)
            gts.append(gt)
            metas.append(meta)
        weak = dict(images=np.stack(imgs), gt=_stack_tree(gts),
                    meta=_stack_tree(metas))
        strong = dict(weak, images=np.stack(strong_imgs))
        return weak, strong

    def epoch(self, epoch: int):
        rs = np.random.RandomState(self.seed + 31 * epoch)
        n_un = len(self.unsup_dataset.records)
        order = rs.permutation(n_un)
        cursor = 0
        for sup_batch in self.sup.epoch(epoch):
            if cursor + self.unsup_batch_size > n_un:
                order = rs.permutation(n_un)
                cursor = 0
            idxs = order[cursor:cursor + self.unsup_batch_size]
            cursor += self.unsup_batch_size
            weak, strong = self._unsup_batch(idxs, epoch)
            yield {'sup': sup_batch, 'unsup_weak': weak,
                   'unsup_strong': strong}
