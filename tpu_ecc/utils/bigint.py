"""Host-side big-integer <-> limb-vector packing helpers.

These run in plain Python (arbitrary-precision ints) at spec-build time and at
host/device boundaries (byte codecs). All device math lives in tpu_ecc.ops.
"""

from __future__ import annotations

import numpy as np


def int_to_limbs(x: int, n_limbs: int, limb_bits: int) -> tuple[int, ...]:
    """Decompose non-negative int into little-endian base-2**limb_bits digits."""
    if x < 0:
        raise ValueError("negative")
    mask = (1 << limb_bits) - 1
    out = []
    for _ in range(n_limbs):
        out.append(x & mask)
        x >>= limb_bits
    if x:
        raise ValueError("value does not fit in limbs")
    return tuple(out)


def limbs_to_int(limbs, limb_bits: int) -> int:
    """Recompose little-endian digits (arbitrary magnitudes allowed)."""
    acc = 0
    for i, l in enumerate(limbs):
        acc += int(l) << (limb_bits * i)
    return acc


def int_to_limbs_np(x: int, n_limbs: int, limb_bits: int) -> np.ndarray:
    return np.array(int_to_limbs(x, n_limbs, limb_bits), dtype=np.uint32)


def ints_to_limbs_np(xs, n_limbs: int, limb_bits: int) -> np.ndarray:
    """Batch of ints -> uint32[n_limbs, batch] (limb-major layout).

    Vectorized via bytes + unpackbits: per-element Python limb loops cost ~30us
    each and dominate protocol batches; this path is ~100x faster."""
    N = len(xs)
    if N == 0:
        return np.zeros((n_limbs, 0), np.uint32)
    nbytes = (n_limbs * limb_bits + 7) // 8
    buf = b"".join(int(x).to_bytes(nbytes, "little") for x in xs)
    arr = np.frombuffer(buf, np.uint8).reshape(N, nbytes)
    bits = np.unpackbits(arr, axis=1, bitorder="little")[:, : n_limbs * limb_bits]
    bits = bits.reshape(N, n_limbs, limb_bits).astype(np.uint32)
    weights = (np.uint32(1) << np.arange(limb_bits, dtype=np.uint32))
    limbs = (bits * weights).sum(axis=2, dtype=np.uint32)  # [N, n_limbs]
    return np.ascontiguousarray(limbs.T)


def limbs_np_to_ints(arr, limb_bits: int) -> list[int]:
    """uint32[n_limbs, batch] -> list of batch ints."""
    a = np.asarray(arr)
    if a.ndim == 1:
        a = a[:, None]
    n, = a.shape[:1]
    flat = a.reshape(n, -1)
    return [limbs_to_int(flat[:, k], limb_bits) for k in range(flat.shape[1])]


def be_bytes_to_int(b: bytes) -> int:
    return int.from_bytes(b, "big")


def int_to_be_bytes(x: int, length: int) -> bytes:
    return int(x).to_bytes(length, "big")


def bit_length_limbs(bits: int, limb_bits: int, headroom: int = 0) -> int:
    return -(-(bits) // limb_bits) + headroom
