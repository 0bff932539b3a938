"""Profiling helpers (SURVEY.md §5: the reference has only `go test -bench`
microbenchmarks; here we expose jax.profiler traces + simple op timers)."""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a TensorBoard-viewable device trace of the enclosed ops."""
    with jax.profiler.trace(log_dir):
        yield


def time_op(fn: Callable, *args, iters: int = 10, warmup: int = 1):
    """Wall-time a jitted op; returns seconds per call (device-synced)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
