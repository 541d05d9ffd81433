"""Profiling / timing utilities.

TPU equivalents of /root/reference/mmdet/utils/profiling.py (profile_time,
:10-40 — CUDA events there, device sync + perf_counter here) plus a
jax.profiler trace context for XLA-level traces viewable in TensorBoard or
Perfetto.
"""
from __future__ import annotations

import contextlib
import logging
import time
from typing import Optional

import jax

log = logging.getLogger('erd_tpu')


@contextlib.contextmanager
def profile_time(trace_name: str, name: str, enabled: bool = True,
                 stream=None, end_stream=None):
    """Time a block with device synchronisation; logs '<trace>_<name> Ns'."""
    if not enabled:
        yield
        return
    jax.effects_barrier()
    t0 = time.perf_counter()
    try:
        yield
    finally:
        jax.effects_barrier()
        dt = time.perf_counter() - t0
        log.info(f'{trace_name}_{name} {dt:.6f}s')


@contextlib.contextmanager
def xla_trace(logdir: str):
    """Capture an XLA profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Running per-step timing stats (IterTimerHook analogue)."""

    def __init__(self):
        self._last = None
        self.count = 0
        self.total = 0.0

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self.total += now - self._last
            self.count += 1
        self._last = now

    @property
    def mean(self):
        return self.total / max(self.count, 1)
