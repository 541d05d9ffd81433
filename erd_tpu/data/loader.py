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

    def _batches_for_epoch(self, epoch: int):
        rs = np.random.RandomState(self.cfg.seed + epoch)
        batches = []
        for g, idxs in self.groups.items():
            idxs = np.asarray(idxs)
            if self.cfg.shuffle:
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
                with cf.ThreadPoolExecutor(self.cfg.num_workers) as pool:
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
