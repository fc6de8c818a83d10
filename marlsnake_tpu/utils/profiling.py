"""Profiling helpers: XLA traces and block-until-ready timers.

The reference has no tracing/profiling at all (SURVEY.md §5); this wraps
``jax.profiler`` for TensorBoard-viewable device traces plus simple
wall-clock timing of jitted programs.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA device trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit(fn: Callable, *args, iters: int = 10, warmup: int = 2,
           **kwargs) -> float:
    """Mean wall-clock seconds per call, synchronized on the output."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def env_steps_per_sec(step_fn: Callable, states, actions,
                      num_envs: int, iters: int = 20) -> float:
    dt = timeit(step_fn, states, actions, iters=iters)
    return num_envs / dt
