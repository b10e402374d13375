"""RFC 6979 deterministic nonce generation (host-side HMAC-DRBG).

Equivalent of the `rfc6979` crate the reference wires into every SignPrimitive
(e.g. sm2/src/dsa/signing.rs:196-201, bign256/src/dsa/signing.rs:117). Exact
bits2int/int2octets/bits2octets semantics including qlen > hlen (P-521).
"""

from __future__ import annotations

import hashlib
import hmac


def bits2int(data: bytes, qlen: int) -> int:
    v = int.from_bytes(data, "big")
    blen = len(data) * 8
    if blen > qlen:
        v >>= blen - qlen
    return v


def int2octets(v: int, q: int) -> bytes:
    rolen = (q.bit_length() + 7) // 8
    return v.to_bytes(rolen, "big")


def bits2octets(data: bytes, q: int) -> bytes:
    z1 = bits2int(data, q.bit_length())
    z2 = z1 - q
    if z2 < 0:
        z2 = z1
    return int2octets(z2, q)


def generate_k(q: int, x: int, h1: bytes, hashname: str = "sha256",
               extra: bytes = b"") -> int:
    """Deterministic k per RFC 6979 §3.2 (with optional additional data)."""
    hfunc = getattr(hashlib, hashname) if hasattr(hashlib, hashname) else (
        lambda d=b"": hashlib.new(hashname, d))
    hlen = hfunc(b"").digest_size
    qlen = q.bit_length()
    V = b"\x01" * hlen
    K = b"\x00" * hlen

    def hm(key, msg):
        return hmac.new(key, msg, lambda d=b"": hfunc(d)).digest()

    seed = int2octets(x, q) + bits2octets(h1, q) + extra
    K = hm(K, V + b"\x00" + seed)
    V = hm(K, V)
    K = hm(K, V + b"\x01" + seed)
    V = hm(K, V)
    while True:
        T = b""
        while len(T) * 8 < qlen:
            V = hm(K, V)
            T += V
        k = bits2int(T, qlen)
        if 1 <= k < q:
            return k
        K = hm(K, V + b"\x00")
        V = hm(K, V)


def generate_k_batch(q: int, xs, h1s, hashname: str = "sha256",
                     extra: bytes = b"") -> list[int]:
    """Batched deterministic k. Uses the native C++ kernels
    (tpu_ecc/native/fastcrypt.cpp) when eligible — qlen == 256, SHA-256 or
    SM3, no extra data, 32-byte digests — else the Python loop above."""
    if hashname in ("sha256", "sm3") and not extra and q.bit_length() == 256:
        from .. import native

        fn = (native.rfc6979_k_sha256_batch if hashname == "sha256"
              else native.rfc6979_k_sm3_batch)
        ks = fn(q, xs, list(h1s))
        if ks is not None:
            return ks
    return [generate_k(q, x, h1, hashname, extra) for x, h1 in zip(xs, h1s)]
