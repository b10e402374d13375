"""SEC1 point encoding/decoding (host-side byte codecs).

Mirrors the reference's EncodedPoint handling: identity = single 0x00 byte,
compressed = 0x02/0x03 || x, uncompressed = 0x04 || x || y, with on-curve
checks on decode (primeorder/src/affine.rs:129-195).
"""

from __future__ import annotations

from ..curves.specs import CurveSpec
from ..utils import ec_host
from ..utils.bigint import be_bytes_to_int, int_to_be_bytes


class DecodeError(ValueError):
    pass


def encode_point(curve: CurveSpec, pt, compress: bool = False) -> bytes:
    """pt = (x, y) ints or None (identity)."""
    if pt is None:
        return b"\x00"
    x, y = pt
    fb = curve.field_bytes
    if compress:
        return bytes([2 + (y & 1)]) + int_to_be_bytes(x, fb)
    return b"\x04" + int_to_be_bytes(x, fb) + int_to_be_bytes(y, fb)


def decode_point(curve: CurveSpec, data: bytes):
    """bytes -> (x, y) or None (identity). Raises DecodeError on bad input."""
    if len(data) == 0:
        raise DecodeError("empty point")
    tag = data[0]
    fb = curve.field_bytes
    if tag == 0x00:
        if len(data) != 1:
            raise DecodeError("bad identity encoding")
        return None
    if tag in (0x02, 0x03):
        if len(data) != 1 + fb:
            raise DecodeError("bad compressed length")
        x = be_bytes_to_int(data[1:])
        if x >= curve.p:
            raise DecodeError("x out of range")
        pt = ec_host.decompress(curve, x, tag == 0x03)
        if pt is None:
            raise DecodeError("not on curve")
        return pt
    if tag == 0x04:
        if len(data) != 1 + 2 * fb:
            raise DecodeError("bad uncompressed length")
        x = be_bytes_to_int(data[1: 1 + fb])
        y = be_bytes_to_int(data[1 + fb:])
        if x >= curve.p or y >= curve.p:
            raise DecodeError("coordinate out of range")
        if not ec_host.on_curve(curve, (x, y)):
            raise DecodeError("not on curve")
        return (x, y)
    raise DecodeError(f"bad tag {tag:#x}")


def compact_encode(curve: CurveSpec, pt) -> bytes:
    """x-only 'compact' encoding (cf. primeorder affine.rs compaction)."""
    if pt is None:
        raise DecodeError("cannot compact-encode identity")
    return int_to_be_bytes(pt[0], curve.field_bytes)


def compact_decode(curve: CurveSpec, data: bytes):
    """Decompact: x-only -> point with even-y convention (DecompactPoint,
    used by k256 Schnorr x-only keys, schnorr/verifying.rs:38-45)."""
    if len(data) != curve.field_bytes:
        raise DecodeError("bad compact length")
    x = be_bytes_to_int(data)
    if x >= curve.p:
        raise DecodeError("x out of range")
    pt = ec_host.decompress(curve, x, False)
    if pt is None:
        raise DecodeError("not on curve")
    return pt
