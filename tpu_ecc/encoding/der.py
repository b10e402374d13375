"""Strict DER encoding for ECDSA signatures (r, s) — host-side.

Strictness matters: the Wycheproof suites (ported from
<curve>/src/test_vectors/data/wycheproof.blb, runner k256/src/ecdsa.rs:351-425)
contain many BER-laxness cases that MUST be rejected, matching the `ecdsa`
crate's der::Signature behavior.
"""

from __future__ import annotations


class DerError(ValueError):
    pass


def _encode_der_int(v: int) -> bytes:
    if v < 0:
        raise DerError("negative")
    b = v.to_bytes((v.bit_length() + 7) // 8 or 1, "big")
    if b[0] & 0x80:
        b = b"\x00" + b
    return b


def _encode_len(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    b = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(b)]) + b


def sig_to_der(r: int, s: int) -> bytes:
    ri = _encode_der_int(r)
    si = _encode_der_int(s)
    body = b"\x02" + _encode_len(len(ri)) + ri + b"\x02" + _encode_len(len(si)) + si
    return b"\x30" + _encode_len(len(body)) + body


def _read_len(data: bytes, pos: int):
    if pos >= len(data):
        raise DerError("truncated length")
    b0 = data[pos]
    pos += 1
    if b0 < 0x80:
        return b0, pos
    nlen = b0 & 0x7F
    if nlen == 0 or nlen > 4:
        raise DerError("bad long-form length")
    if pos + nlen > len(data):
        raise DerError("truncated length")
    n = int.from_bytes(data[pos: pos + nlen], "big")
    pos += nlen
    # DER: minimal length encoding required
    if n < 0x80 or n < (1 << (8 * (nlen - 1))):
        raise DerError("non-minimal length")
    return n, pos


def _read_int(data: bytes, pos: int):
    if pos >= len(data) or data[pos] != 0x02:
        raise DerError("expected INTEGER")
    n, pos = _read_len(data, pos + 1)
    if n == 0:
        raise DerError("empty INTEGER")
    if pos + n > len(data):
        raise DerError("truncated INTEGER")
    body = data[pos: pos + n]
    if body[0] & 0x80:
        raise DerError("negative INTEGER")
    if n > 1 and body[0] == 0 and not (body[1] & 0x80):
        raise DerError("non-minimal INTEGER")
    return int.from_bytes(body, "big"), pos + n


def der_to_sig(data: bytes):
    """Strict DER -> (r, s). Raises DerError on any laxness."""
    if len(data) < 2 or data[0] != 0x30:
        raise DerError("expected SEQUENCE")
    n, pos = _read_len(data, 1)
    if pos + n != len(data):
        raise DerError("trailing garbage or truncated")
    r, pos = _read_int(data, pos)
    s, pos = _read_int(data, pos)
    if pos != len(data):
        raise DerError("extra content in SEQUENCE")
    return r, s


def sig_to_bytes(curve, r: int, s: int) -> bytes:
    """Fixed-width (r || s) encoding, the `Signature::to_bytes` analogue."""
    sb = (curve.scalar.bits + 7) // 8
    return r.to_bytes(sb, "big") + s.to_bytes(sb, "big")


def sig_from_bytes(curve, data: bytes):
    sb = (curve.scalar.bits + 7) // 8
    if len(data) != 2 * sb:
        raise DerError("bad fixed signature length")
    r = int.from_bytes(data[:sb], "big")
    s = int.from_bytes(data[sb:], "big")
    if not (0 < r < curve.n and 0 < s < curve.n):
        raise DerError("signature scalar out of range")
    return r, s
