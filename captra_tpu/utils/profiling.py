"""Profiling helpers.

The reference's tracing is a wall-clock Timer decomposing the tracking loop
(SURVEY.md §5); on TPU the equivalent first-class tool is the XLA profiler —
these wrappers emit traces viewable in TensorBoard/Perfetto plus simple
blocking wall-clock measurements for quick numbers.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA device trace: `with trace('/tmp/tb'): run()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up on the TraceMe track)."""
    return jax.profiler.TraceAnnotation(name)


def block_time(fn, *args, iters: int = 10, warmup: int = 1, **kwargs):
    """Blocking wall-clock of a jitted callable; returns seconds/iter.

    NOTE: feed *distinct* inputs when measuring through remote-execution
    tunnels that may cache identical (program, input) pairs.
    """
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
