"""Schnorr signatures (BIP 340), secp256k1 only — like k256's `schnorr` module.

Host: tagged hashes, nonce derivation, x-only key handling
(k256/src/schnorr.rs:88-176). Device: the batched verify lincomb
s*G - e*P (schnorr/verifying.rs:62-110) and batched sign R = k*G.
"""

from __future__ import annotations

import dataclasses
import functools
import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.specs import CurveSpec, get_curve
from ..utils import ec_host
from ..utils.bigint import int_to_be_bytes, be_bytes_to_int
from ..ops import fe as F
from ..ops import points as P
from ..ops import scalarmul as SM
from .pipeline import run_pipelined as _run_pipelined


def tagged_hash(tag: str, data: bytes) -> bytes:
    th = hashlib.sha256(tag.encode()).digest()
    return hashlib.sha256(th + th + data).digest()


@functools.lru_cache(maxsize=None)
def _tag_prefix(tag: str) -> bytes:
    th = hashlib.sha256(tag.encode()).digest()
    return th + th


def tagged_hash_batch(tag: str, datas) -> list:
    """Batched BIP340 tagged hashes: tagged(m) = SHA256(th||th||m), so a
    uniform-length batch rides the native C++ sha256_batch kernel
    (tpu_ecc/native/fastcrypt.cpp); anything else falls back per message."""
    pre = _tag_prefix(tag)
    msgs = [pre + d for d in datas]
    if len(msgs) > 1 and len({len(m) for m in msgs}) == 1:
        from ..native import sha256_batch

        out = sha256_batch(msgs, len(msgs[0]))
        if out is not None:
            return out
    return [hashlib.sha256(m).digest() for m in msgs]


def lift_x(curve: CurveSpec, x: int):
    """BIP340 lift_x: point with given x and even y, or None."""
    if not 0 < x < curve.p:
        return None
    pt = ec_host.decompress(curve, x, False)
    return pt


# ---------------------------------------------------------------------------
# batched device cores
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _sign_core(curve: CurveSpec):
    """R = k*G -> x(R) words | y-parity. Word-packed IO both ways (one H2D
    + one D2H transfer per chunk; protocols/pipeline.py)."""
    s = curve.scalar
    nws = (s.bits + 31) // 32

    @jax.jit
    def core(buf):
        k_raw = F.relimb(buf[:nws], 32, s.limb_bits, s.n_limbs)
        R = SM.mul_by_generator(curve, k_raw)
        x, y, _ = P.to_affine(R)
        xw = F.fe_to_words(x)
        yr = F.fto_raw_canonical(y)
        y_odd = yr[0] & np.uint32(1)
        return jnp.concatenate([xw, y_odd[None]], axis=0)

    return core


@functools.lru_cache(maxsize=None)
def _verify_core(curve: CurveSpec):
    """All-device verify incl. the x-only key decompress: lift_x runs as a
    batched device sqrt (no per-element host work — same pattern as
    ecdsa._recover_core), then R = s*G - e*P; valid iff the sqrt existed,
    R != O, affine-x(R) == r and y(R) is even (BIP340; cf.
    k256/src/schnorr/verifying.rs:62-110)."""
    f = curve.field
    s = curve.scalar
    fbits, sbits = f.bits, s.bits
    nwf = (fbits + 31) // 32
    nws = (sbits + 31) // 32

    @jax.jit
    def core(buf):
        """buf: [2*nwf + 2*nws, B] uint32 — px, r field words; s, n-e
        scalar words. One H2D transfer (~30ms per-transfer tunnel)."""
        bshape = buf.shape[1:]
        o = 0
        px_w = buf[o:o + nwf]; o += nwf
        r_w = buf[o:o + nwf]; o += nwf
        s_w = buf[o:o + nws]; o += nws
        ne_w = buf[o:o + nws]; o += nws
        x = F.fe_from_words(f, px_w, fbits)
        # lift_x: y = sqrt(x^3 + b) with even y (a = 0 for secp256k1)
        rhs = F.fmul(F.fsquare(x), x) + F.fe_from_int(f, curve.b, bshape)
        y, is_sq = F.fsqrt(rhs)
        y_odd = (F.fto_raw_canonical(y)[0] & np.uint32(1)) == 1
        y = F.fselect(y_odd, F.fneg(y), y)
        Pp = P.from_affine(curve, x, y)
        G = P.generator(curve, bshape)
        s_raw = F.relimb(s_w, 32, s.limb_bits, s.n_limbs)
        ne_raw = F.relimb(ne_w, 32, s.limb_bits, s.n_limbs)
        R = SM.lincomb_auto([(G, s_raw), (Pp, ne_raw)])
        xR, yR, inf = P.to_affine(R)
        okx = F.feq(xR, F.fe_from_words(f, r_w, fbits))
        y_even = (F.fto_raw_canonical(yR)[0] & np.uint32(1)) == 0
        return is_sq & jnp.logical_not(inf) & okx & y_even

    return core


# x-only public keys share the sign core: both are d/k words -> x(·G) | parity
_pubkey_core = _sign_core


def xonly_public_keys(curve: CurveSpec, d_ints, chunk=None) -> list:
    """Batched x-only public keys x(dG) (ct device comb, chunk-pipelined)."""
    sc = curve.scalar
    nwf = (curve.field.bits + 31) // 32
    pk = _run_pipelined(
        _pubkey_core(curve),
        lambda sl: F.words_from_ints(list(d_ints[sl]), sc.bits),
        len(d_ints), chunk, pad_col=F.words_from_ints([1], sc.bits))
    return F.ints_from_words(pk[:nwf])


def sign_batch(curve: CurveSpec, d_ints, msgs, aux_rands, chunk=None):
    """Batched BIP340 sign. Returns a list of 64-byte signatures, with None
    in any lane whose derived nonce was zero — BIP340's "fail this signing
    attempt" per call (k256/src/schnorr/signing.rs errors per signature;
    probability 2^-256, reachable only adversarially).

    Both scalar-muls run chunk-pipelined on device (protocols/pipeline.py):
    the public keys dG, then — after the host nonce hashing, batched through
    the native SHA-256 kernel — R = kG."""
    n, fb = curve.n, curve.field_bytes
    B = len(d_ints)
    sc = curve.scalar
    nwf = (curve.field.bits + 31) // 32
    core = _sign_core(curve)
    pad = F.words_from_ints([1], sc.bits)
    pk = _run_pipelined(
        core, lambda sl: F.words_from_ints(list(d_ints[sl]), sc.bits),
        B, chunk, pad_col=pad)
    px_ints = F.ints_from_words(pk[:nwf])
    py_odd = pk[nwf]
    # host nonce derivation (BIP340: aux + nonce tagged hashes), batched
    d_adj = [n - d if py_odd[i] else d for i, d in enumerate(d_ints)]
    pxs = [int_to_be_bytes(x, fb) for x in px_ints]
    aux_h = tagged_hash_batch("BIP0340/aux", list(aux_rands))
    rand = tagged_hash_batch("BIP0340/nonce", [
        int_to_be_bytes(dd ^ be_bytes_to_int(ah), 32) + px + m
        for dd, ah, px, m in zip(d_adj, aux_h, pxs, msgs)])
    ks = [be_bytes_to_int(r) % n for r in rand]
    k_bad = [k == 0 for k in ks]                 # per-lane, not batch-wide
    ks = [1 if b else k for k, b in zip(ks, k_bad)]
    # R = k*G pipelined; flip k for odd-y R
    packed = _run_pipelined(
        core, lambda sl: F.words_from_ints(ks[sl], sc.bits),
        B, chunk, pad_col=pad)
    rxs = F.ints_from_words(packed[:nwf])
    y_odd = packed[nwf]
    rbs = [int_to_be_bytes(x, fb) for x in rxs]
    es = tagged_hash_batch("BIP0340/challenge", [
        rb + px + m for rb, px, m in zip(rbs, pxs, msgs)])
    sigs = []
    for i, (dd, k, rb, eh) in enumerate(zip(d_adj, ks, rbs, es)):
        if k_bad[i]:
            sigs.append(None)
            continue
        kf = n - k if y_odd[i] else k
        s = (kf + (be_bytes_to_int(eh) % n) * dd) % n
        sigs.append(rb + int_to_be_bytes(s, fb))
    return sigs


def verify_batch(curve: CurveSpec, px_ints, msgs, sigs, chunk=None):
    """Batched BIP340 verify. Returns list[bool]. The host does only range
    checks, hashing and word packing; the x-only decompress (lift_x) and all
    group algebra run batched on device, chunk-pipelined for big batches."""
    n, p, fb = curve.n, curve.p, curve.field_bytes
    f, sc = curve.field, curve.scalar
    pre_ok = []

    def prep(sl):
        xs, ss, nes, rs = [], [], [], []
        chall = tagged_hash_batch("BIP0340/challenge", [
            (sig[:fb] if len(sig) == 2 * fb else b"\x00" * fb)
            + int_to_be_bytes(px % p, fb) + m
            for px, m, sig in zip(px_ints[sl], msgs[sl], sigs[sl])])
        for px, sig, eh in zip(px_ints[sl], sigs[sl], chall):
            ok = len(sig) == 2 * fb and 0 < px < p
            r = be_bytes_to_int(sig[:fb]) if ok else 1
            s = be_bytes_to_int(sig[fb:]) if ok else 1
            ok = ok and r < p and s < n
            e = be_bytes_to_int(eh) % n if ok else 0
            if not ok:
                px, r, s = curve.gx, 1, 1
            pre_ok.append(ok)
            xs.append(px)
            ss.append(s)
            nes.append((n - e) % n)
            rs.append(r)
        return np.concatenate([
            F.words_from_ints(xs, f.bits),
            F.words_from_ints(rs, f.bits),
            F.words_from_ints(ss, sc.bits),
            F.words_from_ints(nes, sc.bits),
        ], axis=0)

    pad = np.concatenate([
        F.words_from_ints([curve.gx], f.bits),
        F.words_from_ints([1], f.bits),
        F.words_from_ints([1], sc.bits),
        F.words_from_ints([0], sc.bits),
    ], axis=0)
    raw = _run_pipelined(_verify_core(curve), prep, len(sigs), chunk,
                         pad_col=pad)
    return [bool(a and b) for a, b in zip(pre_ok, raw[0])]


# ---------------------------------------------------------------------------
# host key API (k256/src/schnorr/{signing,verifying}.rs analogues)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class SigningKey:
    curve: CurveSpec
    d: int

    @classmethod
    def from_bytes(cls, data: bytes) -> "SigningKey":
        c = get_curve("secp256k1")
        d = be_bytes_to_int(data)
        if not 0 < d < c.n:
            raise ValueError("invalid secret")
        return cls(c, d)

    def verifying_key(self) -> "VerifyingKey":
        # ct device comb on the secret d (DESIGN.md ct policy)
        pt = SM.derive_public(self.curve, self.d)
        return VerifyingKey(self.curve, pt[0])

    def sign_with_aux_rand(self, msg: bytes, aux: bytes) -> bytes:
        (sig,) = sign_batch(self.curve, [self.d], [msg], [aux])
        if sig is None:   # k == 0: BIP340 "fail this signing attempt"
            raise ValueError("derived nonce is zero; retry with fresh aux")
        return sig

    def sign(self, msg: bytes) -> bytes:
        return self.sign_with_aux_rand(msg, b"\x00" * 32)


@dataclasses.dataclass
class VerifyingKey:
    curve: CurveSpec
    x: int  # x-only public key

    @classmethod
    def from_bytes(cls, data: bytes) -> "VerifyingKey":
        c = get_curve("secp256k1")
        x = be_bytes_to_int(data)
        if lift_x(c, x) is None:
            raise ValueError("invalid x-only key")
        return cls(c, x)

    def to_bytes(self) -> bytes:
        return int_to_be_bytes(self.x, self.curve.field_bytes)

    def verify(self, msg: bytes, sig: bytes) -> bool:
        return verify_batch(self.curve, [self.x], [msg], [sig])[0]
