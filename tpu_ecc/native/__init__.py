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
        lib.rfc6979_k_sha256_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_char_p, ctypes.c_int32]
        lib.sha256_batch.argtypes = [
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def rfc6979_k_sha256_batch(q: int, xs, h1s) -> list[int] | None:
    """Batched RFC 6979 k for qlen == 256 / SHA-256 / no extra data.
    xs: secret scalars (ints); h1s: 32-byte digests. None if unavailable."""
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
    lib.rfc6979_k_sha256_batch(qb, xb, hb, out, B)
    raw = out.raw
    return [int.from_bytes(raw[32 * b:32 * b + 32], "big") for b in range(B)]


def sha256_batch(msgs, msg_len: int) -> list[bytes] | None:
    lib = get_lib()
    if lib is None:
        return None
    B = len(msgs)
    buf = b"".join(msgs)
    assert len(buf) == B * msg_len
    out = ctypes.create_string_buffer(32 * B)
    lib.sha256_batch(buf, msg_len, out, B)
    raw = out.raw
    return [raw[32 * b:32 * b + 32] for b in range(B)]
