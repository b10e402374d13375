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

from ..ops import fe as F
from ..ops import points as P
from ..ops import scalarmul as SM
from . import rfc6979
from .belt import belt_hash, belt_hash_batch
from .pipeline import run_pipelined as _run_pipelined

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


def _generate_k_belt_batch(q: int, xs, h1s) -> list:
    """Batched RFC6979-BeltHash nonces: the native C++ kernel when available
    (~10us/nonce vs ~6ms for the Python belt loop), else per element."""
    from ..native import rfc6979_k_belt_batch

    if len(xs) > 1:
        ks = rfc6979_k_belt_batch(q, list(xs), list(h1s))
        if ks is not None:
            return ks
    return [_generate_k_belt(q, x, h1) for x, h1 in zip(xs, h1s)]


@functools.lru_cache(maxsize=None)
def _kg_core(curve: CurveSpec):
    """k words -> x(kG) words (packed IO both ways; protocols/pipeline.py)."""
    s = curve.scalar
    nws = (s.bits + 31) // 32

    @jax.jit
    def core(buf):
        k_raw = F.relimb(buf[:nws], 32, s.limb_bits, s.n_limbs)
        R = SM.mul_by_generator(curve, k_raw)
        x, _, _ = P.to_affine(R)
        return F.fe_to_words(x)

    return core


@functools.lru_cache(maxsize=None)
def _lincomb_core(curve: CurveSpec):
    """buf [2*nwf + 2*nws, B] = qx | qy | a | b words -> x(aG + bQ) words |
    ok flag. Curve membership of Q is checked on device (the reference
    rejects off-curve keys at decode, primeorder/src/affine.rs:164-195)."""
    s = curve.scalar
    f = curve.field
    fbits, sbits = f.bits, s.bits
    nwf = (fbits + 31) // 32
    nws = (sbits + 31) // 32

    @jax.jit
    def core(buf):
        bshape = buf.shape[1:]
        o = 0
        qx_w = buf[o:o + nwf]; o += nwf
        qy_w = buf[o:o + nwf]; o += nwf
        a_w = buf[o:o + nws]; o += nws
        b_w = buf[o:o + nws]; o += nws
        qx = F.fe_from_words(f, qx_w, fbits)
        qy = F.fe_from_words(f, qy_w, fbits)
        rhs = F.fmul(F.fsquare(qx), qx)
        rhs = rhs + F.fmul(F.fe_from_int(f, curve.a, bshape), qx)
        rhs = rhs + F.fe_from_int(f, curve.b, bshape)
        q_on_curve = F.feq(F.fsquare(qy), rhs)
        a_raw = F.relimb(a_w, 32, s.limb_bits, s.n_limbs)
        b_raw = F.relimb(b_w, 32, s.limb_bits, s.n_limbs)
        Q = P.from_affine(curve, qx, qy)
        G = P.generator(curve, bshape)
        R = SM.lincomb([(G, a_raw), (Q, b_raw)])
        x, _, inf = P.to_affine(R)
        ok = jnp.logical_and(q_on_curve, jnp.logical_not(inf))
        return jnp.concatenate(
            [F.fe_to_words(x), ok.astype(jnp.uint32)[None]], axis=0)

    return core


def sign_batch(curve: CurveSpec, d_ints, msgs, chunk=None):
    """Batched bign-DSA sign. Returns list of 48-byte signatures.

    All belt hashing (message, nonce derivation, S0) runs through the
    native C++ batch kernels; R = kG is chunk-pipelined on device."""
    q = curve.n
    s = curve.scalar
    nwf = (curve.field.bits + 31) // 32
    Hs = belt_hash_batch(list(msgs))
    hs = [int.from_bytes(H, "little") % q for H in Hs]
    ks = _generate_k_belt_batch(q, d_ints,
                                [h.to_bytes(32, "big") for h in hs])
    packed = _run_pipelined(
        _kg_core(curve), lambda sl: F.words_from_ints(ks[sl], s.bits),
        len(d_ints), chunk, pad_col=F.words_from_ints([1], s.bits))
    xs = F.ints_from_words(packed[:nwf])
    s0_fulls = belt_hash_batch([
        BELT_OID + int(x).to_bytes(32, "little") + H
        for x, H in zip(xs, Hs)])
    sigs = []
    for h, k, d, s0_full in zip(hs, ks, d_ints, s0_fulls):
        s0 = int.from_bytes(s0_full[:16], "little")
        s1 = (k - h - (s0 + (1 << 128)) * d) % q
        sigs.append(s0.to_bytes(16, "little") + s1.to_bytes(32, "little"))
    return sigs


def verify_batch(curve: CurveSpec, pub_pts, msgs, sigs, chunk=None):
    """Batched bign-DSA verify, chunk-pipelined. Returns list[bool]."""
    q, p = curve.n, curve.p
    f = curve.field
    s = curve.scalar
    nwf = (f.bits + 31) // 32
    Hs = belt_hash_batch(list(msgs))
    pre_ok, s0s = [], []

    def prep(sl):
        a_l, b_l, qx_l, qy_l = [], [], [], []
        for msg_i, sig, (qx, qy) in zip(range(sl.start, sl.stop),
                                        sigs[sl], pub_pts[sl]):
            ok = len(sig) == 48
            s0 = int.from_bytes(sig[:16], "little") if ok else 0
            s1 = int.from_bytes(sig[16:], "little") if ok else 0
            ok = ok and s1 < q
            if not (0 <= qx < p and 0 <= qy < p):
                ok = False
            h = int.from_bytes(Hs[msg_i], "little") % q
            pre_ok.append(ok)
            s0s.append(s0)
            a_l.append((s1 + h) % q if ok else 1)
            b_l.append((s0 + (1 << 128)) % q)
            qx_l.append(qx if ok else curve.gx)
            qy_l.append(qy if ok else curve.gy)
        return np.concatenate([
            F.words_from_ints(qx_l, f.bits),
            F.words_from_ints(qy_l, f.bits),
            F.words_from_ints(a_l, s.bits),
            F.words_from_ints(b_l, s.bits)], axis=0)

    pad = np.concatenate([
        F.words_from_ints([curve.gx], f.bits),
        F.words_from_ints([curve.gy], f.bits),
        F.words_from_ints([1], s.bits),
        F.words_from_ints([1], s.bits)], axis=0)
    packed = _run_pipelined(_lincomb_core(curve), prep, len(sigs), chunk,
                            pad_col=pad)
    xs = F.ints_from_words(packed[:nwf])
    okf = packed[nwf]
    t_hashes = belt_hash_batch([
        BELT_OID + int(x).to_bytes(32, "little") + H
        for x, H in zip(xs, Hs)])
    return [bool(ok and o
                 and int.from_bytes(t[:16], "little") == s0)
            for ok, o, t, s0 in zip(pre_ok, okf, t_hashes, s0s)]


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
        # ct device comb on the secret d (DESIGN.md ct policy)
        return VerifyingKey(self.curve, SM.derive_public(self.curve, self.d))

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
