"""bign-DSA (STB 34.101.45) over bign-curve256v1, matching the reference
bign256 crate: belt-hash based, little-endian external encodings.

sign (bign256/src/dsa/signing.rs:104-151):
  H = belt_hash(msg), h = LE(H) mod q; k = RFC6979-BeltHash
  R = x(kG) as LE bytes
  S0 = first 16 bytes of belt_hash(OID || R || H)   (128-bit, LE scalar)
  S1 = (k - h - (S0 + 2^128) d) mod q
  signature = S0 (16B LE) || S1 (32B LE)

verify (dsa/verifying.rs:113-165):
  R = (S1 + h) G + (S0 + 2^128) Q  via lincomb; reject identity
  check S0 == first 16 bytes of belt_hash(OID || LE(x(R)) || H)

Device: mul_by_generator / lincomb batched; host: belt hashing + the (tiny)
scalar algebra around it.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.specs import CurveSpec, get_curve
from ..encoding import sec1
from ..utils import ec_host
from ..utils.bigint import limbs_np_to_ints
from ..ops import fe as F
from ..ops import points as P
from ..ops import scalarmul as SM
from . import rfc6979
from .belt import belt_hash

# DER OID of belt-hash: 1.2.112.0.2.0.34.101.31.81 (bign256/src/dsa.rs:61-63)
BELT_OID = bytes([0x06, 0x09, 0x2A, 0x70, 0x00, 0x02, 0x00, 0x22, 0x65, 0x1F, 0x51])


class _BeltForHmac:
    """hashlib-style adapter so HMAC/RFC6979 can drive belt-hash."""

    digest_size = 32
    block_size = 32

    def __init__(self, data: bytes = b""):
        self._data = bytes(data)

    def update(self, d: bytes):
        self._data += d

    def digest(self) -> bytes:
        return belt_hash(self._data)

    def copy(self):
        h = _BeltForHmac()
        h._data = self._data
        return h

    @property
    def name(self):
        return "belt-hash"


def _generate_k_belt(q: int, x: int, h1: bytes) -> int:
    """RFC 6979 with HMAC-BeltHash (the reference's generate_k::<BeltHash, _>)."""
    import hmac

    qlen = q.bit_length()
    V = b"\x01" * 32
    K = b"\x00" * 32

    def hm(key, msg):
        return hmac.new(key, msg, _BeltForHmac).digest()

    seed = rfc6979.int2octets(x, q) + rfc6979.bits2octets(h1, q)
    K = hm(K, V + b"\x00" + seed)
    V = hm(K, V)
    K = hm(K, V + b"\x01" + seed)
    V = hm(K, V)
    while True:
        T = b""
        while len(T) * 8 < qlen:
            V = hm(K, V)
            T += V
        k = rfc6979.bits2int(T, qlen)
        if 1 <= k < q:
            return k
        K = hm(K, V + b"\x00")
        V = hm(K, V)


@functools.lru_cache(maxsize=None)
def _kg_core(curve: CurveSpec):
    @jax.jit
    def core(k_raw):
        R = SM.mul_by_generator(curve, k_raw)
        x, _, _ = P.to_affine(R)
        return F.fto_raw_canonical(x)

    return core


@functools.lru_cache(maxsize=None)
def _lincomb_core(curve: CurveSpec):
    @jax.jit
    def core(qx, qy, a_raw, b_raw):
        Q = P.from_affine(curve, qx, qy)
        G = P.generator(curve, qx.batch_shape)
        R = SM.lincomb([(G, a_raw), (Q, b_raw)])
        x, _, inf = P.to_affine(R)
        # one packed output = one D2H fetch (~30ms/round-trip tunnel)
        return jnp.concatenate(
            [F.fe_to_words(x), inf.astype(jnp.uint32)[None]], axis=0)

    return core


def sign_batch(curve: CurveSpec, d_ints, msgs):
    """Batched bign-DSA sign. Returns list of 48-byte signatures."""
    q = curve.n
    hs, ks = [], []
    for d, msg in zip(d_ints, msgs):
        H = belt_hash(msg)
        h = int.from_bytes(H, "little") % q
        k = _generate_k_belt(q, d, h.to_bytes(32, "big"))
        hs.append((H, h))
        ks.append(k)
    xr = _kg_core(curve)(SM.pack_scalars(curve, ks))
    xs = limbs_np_to_ints(np.asarray(jax.device_get(xr)), curve.field.limb_bits)
    sigs = []
    for (H, h), k, d, x in zip(hs, ks, d_ints, xs):
        R_le = int(x).to_bytes(32, "little")
        s0_full = belt_hash(BELT_OID + R_le + H)
        s0 = int.from_bytes(s0_full[:16], "little")
        s1 = (k - h - (s0 + (1 << 128)) * d) % q
        sigs.append(s0.to_bytes(16, "little") + s1.to_bytes(32, "little"))
    return sigs


def verify_batch(curve: CurveSpec, pub_pts, msgs, sigs):
    """Batched bign-DSA verify. Returns list[bool]."""
    q = curve.n
    pre_ok, a_l, b_l, hs, s0s = [], [], [], [], []
    for msg, sig in zip(msgs, sigs):
        ok = len(sig) == 48
        s0 = int.from_bytes(sig[:16], "little") if ok else 0
        s1 = int.from_bytes(sig[16:], "little") if ok else 0
        ok = ok and s1 < q
        H = belt_hash(msg)
        h = int.from_bytes(H, "little") % q
        pre_ok.append(ok)
        a_l.append((s1 + h) % q if ok else 1)
        b_l.append((s0 + (1 << 128)) % q)
        hs.append(H)
        s0s.append(s0)
    f = curve.field
    qx = F.fe_from_ints(f, [p_[0] for p_ in pub_pts])
    qy = F.fe_from_ints(f, [p_[1] for p_ in pub_pts])
    packed = np.asarray(_lincomb_core(curve)(
        qx, qy, SM.pack_scalars(curve, a_l), SM.pack_scalars(curve, b_l)))
    nwf = (f.bits + 31) // 32
    xs = F.ints_from_words(packed[:nwf])
    inf = packed[nwf]
    out = []
    for ok, x, is_inf, H, s0 in zip(pre_ok, xs, inf, hs, s0s):
        if not ok or is_inf:
            out.append(False)
            continue
        R_le = int(x).to_bytes(32, "little")
        t = belt_hash(BELT_OID + R_le + H)
        out.append(int.from_bytes(t[:16], "little") == s0)
    return out


@dataclasses.dataclass
class SigningKey:
    curve: CurveSpec
    d: int

    @classmethod
    def from_bytes(cls, data: bytes) -> "SigningKey":
        """bign secret keys are little-endian (the reference's .reverse())."""
        c = get_curve("bign256")
        d = int.from_bytes(data, "little")
        if not 0 < d < c.n:
            raise ValueError("invalid secret")
        return cls(c, d)

    def verifying_key(self) -> "VerifyingKey":
        pt = ec_host.aff_mul(self.curve, self.d, ec_host.aff_generator(self.curve))
        return VerifyingKey(self.curve, pt)

    def sign(self, msg: bytes) -> bytes:
        (sig,) = sign_batch(self.curve, [self.d], [msg])
        return sig


@dataclasses.dataclass
class VerifyingKey:
    curve: CurveSpec
    point: tuple

    @classmethod
    def from_sec1_bytes(cls, data: bytes) -> "VerifyingKey":
        c = get_curve("bign256")
        pt = sec1.decode_point(c, data)
        if pt is None:
            raise ValueError("identity public key")
        return cls(c, pt)

    def verify(self, msg: bytes, sig: bytes) -> bool:
        return verify_batch(self.curve, [self.point], [msg], [sig])[0]
