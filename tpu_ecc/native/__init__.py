"""On-demand-built native host kernels (see fastcrypt.cpp).

`get_lib()` compiles fastcrypt.cpp with g++ the first time (cached in
.cache/native keyed by source hash) and returns a ctypes handle, or None if
no toolchain is available — callers fall back to the pure-Python path, so
the framework never *requires* the native layer.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

_SRC = os.path.join(os.path.dirname(__file__), "fastcrypt.cpp")
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".cache", "native")

_lib = None
_tried = False


def get_lib():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        with open(_SRC, "rb") as fh:
            tag = hashlib.sha256(fh.read()).hexdigest()[:16]
        so = os.path.join(_CACHE, f"fastcrypt-{tag}.so")
        if not os.path.exists(so):
            os.makedirs(_CACHE, exist_ok=True)
            tmp = so + ".tmp"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-pthread", _SRC, "-o", tmp],
                check=True, capture_output=True, timeout=120)
            os.replace(tmp, so)
        lib = ctypes.CDLL(so)
        for name in ("rfc6979_k_sha256_batch", "rfc6979_k_sm3_batch",
                     "rfc6979_k_belt_batch"):
            getattr(lib, name).argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
                ctypes.c_char_p, ctypes.c_int32]
        for name in ("sha256_batch", "sm3_batch"):
            getattr(lib, name).argtypes = [
                ctypes.c_char_p, ctypes.c_int32, ctypes.c_char_p,
                ctypes.c_int32]
        lib.belt_hash_batch.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_char_p, ctypes.c_int32]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _rfc6979_batch(fn_name: str, q: int, xs, h1s) -> list[int] | None:
    """Batched RFC 6979 k for qlen == 256 / 32-byte-digest hash / no extra
    data. xs: secret scalars (ints); h1s: 32-byte digests. None if the
    native library is unavailable or the shape doesn't qualify."""
    lib = get_lib()
    if lib is None or q.bit_length() != 256:
        return None
    B = len(xs)
    if any(len(h) != 32 for h in h1s):
        return None
    qb = q.to_bytes(32, "big")
    xb = b"".join(int(x).to_bytes(32, "big") for x in xs)
    hb = b"".join(h1s)
    out = ctypes.create_string_buffer(32 * B)
    getattr(lib, fn_name)(qb, xb, hb, out, B)
    raw = out.raw
    return [int.from_bytes(raw[32 * b:32 * b + 32], "big") for b in range(B)]


def rfc6979_k_sha256_batch(q: int, xs, h1s) -> list[int] | None:
    return _rfc6979_batch("rfc6979_k_sha256_batch", q, xs, h1s)


def rfc6979_k_sm3_batch(q: int, xs, h1s) -> list[int] | None:
    return _rfc6979_batch("rfc6979_k_sm3_batch", q, xs, h1s)


def rfc6979_k_belt_batch(q: int, xs, h1s) -> list[int] | None:
    return _rfc6979_batch("rfc6979_k_belt_batch", q, xs, h1s)


def _hash_batch(fn_name: str, msgs, msg_len: int) -> list[bytes] | None:
    lib = get_lib()
    if lib is None:
        return None
    B = len(msgs)
    buf = b"".join(msgs)
    assert len(buf) == B * msg_len
    out = ctypes.create_string_buffer(32 * B)
    getattr(lib, fn_name)(buf, msg_len, out, B)
    raw = out.raw
    return [raw[32 * b:32 * b + 32] for b in range(B)]


def sha256_batch(msgs, msg_len: int) -> list[bytes] | None:
    return _hash_batch("sha256_batch", msgs, msg_len)


def sm3_batch(msgs, msg_len: int) -> list[bytes] | None:
    return _hash_batch("sm3_batch", msgs, msg_len)


def belt_hash_batch(msgs) -> list[bytes] | None:
    """Batched belt-hash over VARIABLE-length messages (offsets-delimited)."""
    lib = get_lib()
    if lib is None:
        return None
    B = len(msgs)
    offs = (ctypes.c_int64 * (B + 1))()
    pos = 0
    for i, m in enumerate(msgs):
        offs[i] = pos
        pos += len(m)
    offs[B] = pos
    buf = b"".join(msgs)
    out = ctypes.create_string_buffer(32 * B)
    lib.belt_hash_batch(buf, offs, out, B)
    raw = out.raw
    return [raw[32 * b:32 * b + 32] for b in range(B)]
