"""Profiling / tracing utilities.

The reference's only instrumentation is wall-clock deltas (SURVEY.md
section 5: grape.py:21-22, run_session.py:131).  Here: jax.profiler trace
capture around optimization segments, plus a block_until_ready-disciplined
timer for honest step timing (first call excluded as compile).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 1,
            **kwargs) -> dict:
    """Time a jitted callable with proper device synchronization.

    Returns {compile_s, mean_s, iters_per_sec}.
    """
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    for _ in range(max(warmup - 1, 0)):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    mean = (time.perf_counter() - t0) / iters
    return {
        "compile_s": compile_s,
        "mean_s": mean,
        "iters_per_sec": 1.0 / mean if mean > 0 else float("inf"),
    }


def memory_stats(device=None) -> Optional[dict]:
    """Device memory statistics when the backend exposes them."""
    device = device or jax.devices()[0]
    try:
        return device.memory_stats()
    except (AttributeError, NotImplementedError):
        return None
