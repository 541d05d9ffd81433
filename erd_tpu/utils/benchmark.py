"""Benchmark harnesses: inference, dataloader, dataset.

Mirrors the roles of /root/reference/mmdet/utils/benchmark.py:64-522
(InferenceBenchmark, DataLoaderBenchmark, DatasetBenchmark) with the
reference's convention of warmup iters + repeated timed windows reporting
images/s (benchmark.py:114).
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Dict, Optional

import jax
import numpy as np


@dataclass
class BenchmarkResult:
    fps: float
    times_ms: list

    def as_dict(self):
        return dict(fps=round(self.fps, 2),
                    mean_ms=round(float(np.mean(self.times_ms)), 2),
                    p50_ms=round(float(np.percentile(self.times_ms, 50)), 2),
                    p90_ms=round(float(np.percentile(self.times_ms, 90)), 2))


class InferenceBenchmark:
    """Times detector.predict_jit over repeated batches."""

    def __init__(self, detector, variables, batch, num_warmup=5,
                 max_iter=50):
        self.detector = detector
        self.variables = variables
        self.batch = batch
        self.num_warmup = num_warmup
        self.max_iter = max_iter

    def run(self) -> BenchmarkResult:
        bs = int(self.batch['images'].shape[0])
        for _ in range(self.num_warmup):
            res = self.detector.predict_jit(self.variables, self.batch)
        jax.block_until_ready(res.bboxes)
        times = []
        for _ in range(self.max_iter):
            t0 = time.perf_counter()
            res = self.detector.predict_jit(self.variables, self.batch)
            jax.block_until_ready(res.bboxes)
            times.append((time.perf_counter() - t0) * 1000)
        fps = bs * 1000.0 / float(np.mean(times))
        return BenchmarkResult(fps=fps, times_ms=times)


class DataLoaderBenchmark:
    """Times full batches through DetDataLoader prefetching."""

    def __init__(self, loader, num_warmup=2, max_iter=20):
        self.loader = loader
        self.num_warmup = num_warmup
        self.max_iter = max_iter

    def run(self) -> BenchmarkResult:
        times = []
        it = self.loader.epoch(0)
        bs = self.loader.cfg.batch_size
        for i, _ in enumerate(it):
            now = time.perf_counter()
            if i > 0 and i > self.num_warmup:
                times.append((now - last) * 1000)  # noqa: F821
            last = now  # noqa: F841
            if len(times) >= self.max_iter:
                break
        if not times:
            return BenchmarkResult(fps=0.0, times_ms=[0.0])
        fps = bs * 1000.0 / float(np.mean(times))
        return BenchmarkResult(fps=fps, times_ms=times)


class DatasetBenchmark:
    """Times the raw per-record pipeline (decode+resize+pack)."""

    def __init__(self, dataset, pipeline, max_iter=100):
        self.dataset = dataset
        self.pipeline = pipeline
        self.max_iter = max_iter

    def run(self) -> BenchmarkResult:
        rs = np.random.RandomState(0)
        times = []
        n = min(len(self.dataset.records), self.max_iter)
        for i in range(n):
            t0 = time.perf_counter()
            self.pipeline(self.dataset[i], rs)
            times.append((time.perf_counter() - t0) * 1000)
        fps = 1000.0 / float(np.mean(times))
        return BenchmarkResult(fps=fps, times_ms=times)
