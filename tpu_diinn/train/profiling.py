"""Profiling & debugging hooks.

TPU-native equivalents of the reference's (unused) Lightning profiler slot
and ``detect_anomaly`` flags (``configs/default.yaml:77-85``; SURVEY.md §5):

- ``trace(log_dir)``: jax.profiler trace context (view in TensorBoard/xprof).
- ``enable_debug_nans()`` / ``enable_checkify``: NaN-hunting opt-ins.
- ``synced_time``: wall-time of a step function with a *host fetch* barrier.
  On tunneled TPU platforms ``block_until_ready`` can return at dispatch
  time; fetching a scalar is the only reliable completion barrier.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable


@contextlib.contextmanager
def trace(log_dir: str):
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_debug_nans(on: bool = True) -> None:
    import jax
    jax.config.update("jax_debug_nans", on)


def synced_time(fn: Callable, *args, iters: int = 10,
                warmup: int = 2) -> float:
    """Mean seconds per call; completion forced by fetching a scalar from
    the result tree."""
    import jax
    import jax.numpy as jnp

    def sync(r):
        leaf = jax.tree.leaves(r)[0]
        return float(jnp.sum(leaf)) if leaf.ndim else float(leaf)

    for _ in range(warmup):
        r = fn(*args)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    sync(r)
    return (time.perf_counter() - t0) / iters
