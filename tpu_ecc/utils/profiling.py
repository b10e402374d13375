"""Profiling/tracing hooks (SURVEY §5: the reference has only criterion
benches; here the native tool is the JAX/XLA profiler)."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/tpu_ecc_trace"):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, iters: int = 16, block=None):
    """Median wall time of a jitted callable with dependency-chained calls
    (the methodology of bench.py). `block`: function extracting an array to
    block on; defaults to the result itself."""
    out = fn(*args)
    arr = block(out) if block else out
    arr.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    arr = block(out) if block else out
    arr.block_until_ready()
    return (time.perf_counter() - t0) / iters
