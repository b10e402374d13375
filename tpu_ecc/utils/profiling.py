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


def _fetch_tiny(arr):
    """Force completion with a REAL device-to-host read of a few bytes —
    `block_until_ready` has been observed to return early through the axon
    tunnel (PERF.md), so timing windows must close with an actual fetch."""
    import numpy as np

    flat = arr
    while getattr(flat, "ndim", 0) > 1:
        flat = flat[0]
    return np.asarray(flat[:1])


def time_fn(fn, *args, iters: int = 16, chain=None, block=None, reps: int = 3,
            return_tries: bool = False):
    """Per-call wall time of a jitted callable via chain-length differencing.

    Times a short and a long dependency-chained loop (each iteration's first
    argument derives from the previous output; each window closes with a real
    device fetch) and divides the extra time by the extra calls — fetch
    latency and dispatch ramp cancel in the difference. `chain(out, args) ->
    args` builds the next call's arguments; the default feeds the output back
    as the first argument. `block` extracts the array to fetch.

    Stall robustness: co-tenant stalls and tunnel jitter only ever ADD time,
    but they can land in EITHER window — a stalled short window makes the
    pairwise difference negative (round-2's best-of-2 pairs then *inflated*
    the rate to nonsense). Taking min() over each window's reps separately
    recovers the unstalled time for both before differencing.

    `return_tries=True` additionally returns the per-rep paired differences
    as per-call seconds (possibly empty where a rep's pair was stalled
    negative) so callers can record the run-to-run dispersion behind the
    reported number (VERDICT r3: rates had unrecorded error bars)."""
    if chain is None:
        chain = lambda out, a: (out,) + tuple(a[1:])  # noqa: E731
    out = fn(*args)
    _fetch_tiny(block(out) if block else out)
    args = chain(out, args)

    def run(count, args):
        t0 = time.perf_counter()
        out = None
        for _ in range(count):
            out = fn(*args)
            args = chain(out, args)
        _fetch_tiny(block(out) if block else out)
        return time.perf_counter() - t0, args

    c1 = max(iters // 4, 1)
    for attempt in range(3):
        t1s, t2s = [], []
        for _ in range(max(reps, 1)):
            t1, args = run(c1, args)
            t2, args = run(c1 + iters, args)
            t1s.append(t1)
            t2s.append(t2)
        diff = min(t2s) - min(t1s)
        if diff > 0:
            per_call = diff / iters
            if return_tries:
                tries = [(b - a) / iters for a, b in zip(t1s, t2s) if b > a]
                return per_call, tries
            return per_call
        # every long window out-raced every short one: a co-tenant stall
        # landed in all short reps (seen on fast ops where the chain is a
        # few ms vs multi-ms tunnel jitter). Lengthen the chain so real
        # work dominates the jitter instead of clamping to a bogus rate.
        iters *= 4
    # retries exhausted: every attempt was stall-corrupted. Return inf
    # seconds (rate -> 0.0, visibly bogus-LOW) with empty tries so the
    # caller's record marks the row unreliable — the former 1e-9 clamp
    # fabricated a ~1e15/s rate that nothing could flag (ADVICE r4).
    per_call = float("inf")
    return (per_call, []) if return_tries else per_call
