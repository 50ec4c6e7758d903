"""Profiling/tracing utilities (SURVEY.md §5.1 — the reference has none).

  * `trace(logdir)`: context manager around jax.profiler for perfetto/TB
    traces of the train step or the serving path.
  * `timed`: block_until_ready timing harness.
  * named scopes: models can be wrapped in jax.named_scope for readable
    traces; debug NaN checking is a config flag (jax_debug_nans).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, iters: int = 20, warmup: int = 3):
    """Returns (seconds_per_call, last_output)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def enable_nan_debugging():
    jax.config.update("jax_debug_nans", True)
