"""Tracing / profiling hooks.

The reference has no timers or profiler hooks anywhere (SURVEY.md §5).
Here: named scopes label the filter phases in XLA/profiler traces, a
``trace`` context manager captures a device trace viewable in TensorBoard
or Perfetto, and ``timed`` gives honest wall timings of jitted callables
(block_until_ready included).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator

import jax

# Phase labels used across the engine (predict/extract/gate/update) so
# traces read like the pipeline.
SCOPE_PREDICT = "ekf_predict"
SCOPE_EXTRACT = "ransac_extract"
SCOPE_GATE = "assoc_gate"
SCOPE_UPDATE = "ekf_update"
SCOPE_APPEND = "ekf_append"


def scope(name: str):
    """jax.named_scope wrapper (shows up in XLA HLO + profiler traces)."""
    return jax.named_scope(name)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace: ``with trace('/tmp/trace'): run()`` then
    open in TensorBoard's profile plugin or Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, *args, iters: int = 10, warmup: int = 1,
          **kwargs) -> float:
    """Mean wall seconds per call of a jitted callable (device-synced)."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
