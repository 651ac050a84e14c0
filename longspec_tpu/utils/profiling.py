"""Structured tracing/profiling helpers.

The reference's only timing is wall-clock around decode loops with
`torch.cuda.synchronize` (`llama_glide.py:662-664`, SURVEY §5); the TPU
build makes tracing first-class: `jax.profiler` trace capture (viewable in
TensorBoard/XProf) plus device-synced phase timers that force a host
readback (the only hard barrier through remote-TPU relays).
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Named phase timings with device sync on exit of each phase."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                np.asarray(jax.tree_util.tree_leaves(sync_on)[0])
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": v, "count": self.counts[k],
                    "mean_ms": 1e3 * v / max(self.counts[k], 1)}
                for k, v in sorted(self.totals.items())}
