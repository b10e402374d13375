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
from ..utils.bigint import int_to_be_bytes, be_bytes_to_int, limbs_np_to_ints
from ..ops import fe as F
from ..ops import points as P
from ..ops import scalarmul as SM


def tagged_hash(tag: str, data: bytes) -> bytes:
    th = hashlib.sha256(tag.encode()).digest()
    return hashlib.sha256(th + th + data).digest()


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
    nwf = (curve.field.bits + 31) // 32

    @jax.jit
    def core(k_raw):
        R = SM.mul_by_generator(curve, k_raw)
        x, y, _ = P.to_affine(R)
        xw = F.fe_to_words(x)
        yr = F.fto_raw_canonical(y)
        y_odd = yr[0] & np.uint32(1)
        # one packed output = one D2H fetch (~30ms/round-trip tunnel)
        return jnp.concatenate([xw, y_odd[None]], axis=0)

    return core, nwf


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


@functools.lru_cache(maxsize=None)
def _pubkey_core(curve: CurveSpec):
    """Batched x-only public keys: d -> x(dG) words | y-parity (one buffer
    = one D2H fetch)."""
    @jax.jit
    def core(d_raw):
        Pt = SM.mul_by_generator(curve, d_raw)
        x, y, _ = P.to_affine(Pt)
        yr = F.fto_raw_canonical(y)
        return jnp.concatenate(
            [F.fe_to_words(x), (yr[0] & np.uint32(1))[None]], axis=0)

    return core


def sign_batch(curve: CurveSpec, d_ints, msgs, aux_rands):
    """Batched BIP340 sign. Returns list of 64-byte signatures.

    Both scalar-muls run batched on device: the public keys dG in one
    mul_by_generator call, then (after the host nonce hashing, which needs
    the x bytes) R = kG in another."""
    n, fb = curve.n, curve.field_bytes
    pk = np.asarray(_pubkey_core(curve)(SM.pack_scalars(curve, d_ints)))
    nwf = (curve.field.bits + 31) // 32
    px_ints = F.ints_from_words(pk[:nwf])
    py_odd = pk[nwf]
    d_adj, pxs, ks = [], [], []
    for i, (d, msg, aux) in enumerate(zip(d_ints, msgs, aux_rands)):
        dd = n - d if py_odd[i] else d
        px = int_to_be_bytes(px_ints[i], fb)
        t = dd ^ be_bytes_to_int(tagged_hash("BIP0340/aux", aux))
        rand = tagged_hash("BIP0340/nonce",
                           int_to_be_bytes(t, 32) + px + msg)
        k = be_bytes_to_int(rand) % n
        assert k != 0
        d_adj.append(dd)
        pxs.append(px)
        ks.append(k)
    # R = k*G batched on device; flip k for odd-y R
    k_raw = SM.pack_scalars(curve, ks)
    core, nwf = _sign_core(curve)
    packed = np.asarray(core(k_raw))            # ONE D2H fetch
    rxs = F.ints_from_words(packed[:nwf])
    y_odd = packed[nwf]
    sigs = []
    es, kk = [], []
    for i, (dd, px, k) in enumerate(zip(d_adj, pxs, ks)):
        kf = n - k if y_odd[i] else k
        rb = int_to_be_bytes(rxs[i], fb)
        e = be_bytes_to_int(tagged_hash("BIP0340/challenge",
                                        rb + px + msgs[i])) % n
        s = (kf + e * dd) % n
        sigs.append(rb + int_to_be_bytes(s, fb))
    return sigs


def verify_batch(curve: CurveSpec, px_ints, msgs, sigs):
    """Batched BIP340 verify. Returns list[bool]. The host does only range
    checks, hashing and word packing; the x-only decompress (lift_x) and all
    group algebra run batched on device."""
    n, p, fb = curve.n, curve.p, curve.field_bytes
    pre_ok, xs, ss, nes, rs = [], [], [], [], []
    for px, msg, sig in zip(px_ints, msgs, sigs):
        ok = len(sig) == 2 * fb and 0 < px < p
        r = be_bytes_to_int(sig[:fb]) if ok else 1
        s = be_bytes_to_int(sig[fb:]) if ok else 1
        ok = ok and r < p and s < n
        if ok:
            e = be_bytes_to_int(tagged_hash(
                "BIP0340/challenge",
                sig[:fb] + int_to_be_bytes(px, fb) + msg)) % n
        else:
            px, r, s, e = curve.gx, 1, 1, 0
        pre_ok.append(ok)
        xs.append(px)
        ss.append(s)
        nes.append((n - e) % n)
        rs.append(r)
    f, sc = curve.field, curve.scalar
    buf = np.concatenate([
        F.words_from_ints(xs, f.bits),
        F.words_from_ints(rs, f.bits),
        F.words_from_ints(ss, sc.bits),
        F.words_from_ints(nes, sc.bits),
    ], axis=0)
    ok = np.asarray(_verify_core(curve)(jnp.asarray(buf)))
    return [bool(a and b) for a, b in zip(pre_ok, ok)]


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
        pt = ec_host.aff_mul(self.curve, self.d, ec_host.aff_generator(self.curve))
        return VerifyingKey(self.curve, pt[0])

    def sign_with_aux_rand(self, msg: bytes, aux: bytes) -> bytes:
        (sig,) = sign_batch(self.curve, [self.d], [msg], [aux])
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
