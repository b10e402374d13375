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


def time_fn(fn, *args, iters: int = 16, chain=None, block=None):
    """Mean wall time of a jitted callable over a dependency-chained loop.

    Each iteration's first argument is derived from the previous output so
    the device cannot overlap iterations (no enqueue-pipelining artifacts —
    the bench.py methodology). `chain(out, args) -> args` builds the next
    call's arguments; the default feeds the output back as the first
    argument, which requires fn's output to be shape/dtype-compatible with
    args[0]. `block` extracts an array to block on (default: the output)."""
    if chain is None:
        chain = lambda out, a: (out,) + tuple(a[1:])  # noqa: E731
    out = fn(*args)
    arr = block(out) if block else out
    arr.block_until_ready()
    args = chain(out, args)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        args = chain(out, args)
    arr = block(out) if block else out
    arr.block_until_ready()
    return (time.perf_counter() - t0) / iters
