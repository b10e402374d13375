"""ECDSA: batched device sign/verify + host key API.

Layer map vs the reference:
- Device core (this file's *_batch functions): the scalar-field algebra and
  scalar multiplications of try_sign_prehashed / verify_prehashed
  (k256/src/ecdsa.rs:182-209, ecdsa crate hazmat), batched over TPU lanes.
- Host shell: hashing, RFC 6979 nonces, DER/SEC1 codecs, key objects
  (SigningKey/VerifyingKey, mirroring the `ecdsa` crate API).

Verify avoids the affine inversion entirely: r == x(R) mod n is checked
projectively as X == r*Z or X == (r+n)*Z (mod p), so the verify path is pure
mul/lincomb work.

Policy knobs follow the reference: k256 signs with low-s normalization and
rejects high-s on verify (k256/src/ecdsa.rs:182-209); other curves use plain
RFC 6979 ECDSA. RecoveryId matches k256's (y-parity | x-overflow) semantics.
"""

from __future__ import annotations

import dataclasses
import functools
import hashlib

import numpy as np
import jax
import jax.numpy as jnp

from ..curves.specs import CurveSpec, get_curve
from ..encoding import der, sec1
from ..utils.bigint import be_bytes_to_int
from ..ops import fe as F
from ..ops.fe import U32
from ..ops import points as P
from ..ops import scalarmul as SM
from . import rfc6979
from .pipeline import DEFAULT_CHUNK, run_pipelined as _run_pipelined  # noqa: F401

# per-curve protocol defaults (DigestPrimitive in the reference)
CURVE_HASH = {
    "secp256k1": "sha256", "p192": "sha256", "p224": "sha224", "p256": "sha256",
    "p384": "sha384", "p521": "sha512", "bp256r1": "sha256", "bp256t1": "sha256",
    "bp384r1": "sha384", "bp384t1": "sha384", "sm2": "sm3", "bign256": "sha256",
}
LOW_S_CURVES = {"secp256k1"}
# p192 is verify-only in the reference (legacy curve, p192/src/ecdsa.rs:36-51)
SIGN_UNSUPPORTED = {"p192"}


def hash_msg(curve: CurveSpec, msg: bytes, hashname=None) -> bytes:
    hashname = hashname or CURVE_HASH[curve.name]
    return hashlib.new(hashname, msg).digest()


def hash_msgs(curve: CurveSpec, msgs, hashname=None) -> list:
    """Batched message hashing. Uniform-length SHA-256 batches route through
    the native C++ kernel (tpu_ecc/native/fastcrypt.cpp — ~10x the Python
    hashlib loop at B=4096); anything else falls back per message."""
    hashname = hashname or CURVE_HASH[curve.name]
    if hashname == "sha256" and len(msgs) > 1 \
            and len({len(m) for m in msgs}) == 1:
        from ..native import sha256_batch

        out = sha256_batch(list(msgs), len(msgs[0]))
        if out is not None:
            return out
    return [hash_msg(curve, m, hashname) for m in msgs]


def digest_to_z(curve: CurveSpec, digest: bytes) -> int:
    """bits2int: leftmost qlen bits (the ecdsa crate's bits2field,
    p521/src/ecdsa.rs:48-82 uses this for 512-bit digests vs 521-bit n)."""
    return rfc6979.bits2int(digest, curve.n.bit_length()) % curve.n


def sign_batch_msgs(curve: CurveSpec, d_ints, msgs, hashname=None,
                    chunk=None, low_s=None):
    """Batched sign over RAW messages: hashing rides the native C++
    sha256_batch kernel for uniform-length batches (hash_msgs), then the
    chunk-pipelined prehash path. The message-level twin of sign_batch."""
    hashname = hashname or CURVE_HASH[curve.name]
    zs = [digest_to_z(curve, h) for h in hash_msgs(curve, msgs, hashname)]
    return sign_batch(curve, d_ints, zs, hashname=hashname, chunk=chunk,
                      low_s=low_s)


def verify_batch_msgs(curve: CurveSpec, pub_pts, msgs, sigs, hashname=None,
                      chunk=None, low_s=None):
    """Batched verify over RAW messages (native batched hashing; see
    sign_batch_msgs)."""
    hashname = hashname or CURVE_HASH[curve.name]
    zs = [digest_to_z(curve, h) for h in hash_msgs(curve, msgs, hashname)]
    return verify_batch(curve, pub_pts, zs, sigs, low_s=low_s, chunk=chunk)


# ---------------------------------------------------------------------------
# batched device cores (jitted per (curve, batch-size))
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _sign_core(curve: CurveSpec, low_s: bool):
    from ..utils.bigint import int_to_limbs

    s = curve.scalar
    f = curve.field
    sbits = s.bits

    nww = (sbits + 31) // 32

    @jax.jit
    def core(buf):
        """Packed-word IO (the host<->device link is the bottleneck; see
        PERF.md): input is ONE uint32 buffer [3*nww, B] = k | z | d words
        (ONE H2D transfer — the former 3-input core paid the ~30ms tunnel
        round trip three times per batch); the output is ONE uint32 buffer
        [2*nww + 2, B] = r words | s words | recid | bad. Low-s
        normalization + RecoveryId fold on device (k256 ecdsa.rs:192-197)."""
        k_w = buf[:nww]
        z_w = buf[nww:2 * nww]
        d_w = buf[2 * nww:3 * nww]
        k_raw = F.relimb(k_w, 32, s.limb_bits, s.n_limbs)
        k_mont = F.fe_from_words(s, k_w, sbits)
        z_mont = F.fe_from_words(s, z_w, sbits)
        d_mont = F.fe_from_words(s, d_w, sbits)
        R = SM.mul_by_generator(curve, k_raw)
        x_aff, y_aff, _ = P.to_affine(R)
        r_raw, r_overflow = F.field_to_scalar_raw(f, s, x_aff)
        y_raw = F.fto_raw_canonical(y_aff)
        y_odd = (y_raw[0] & np.uint32(1)) == 1
        # s = k^-1 (z + r d); r enters Montgomery form via * enc(R) = R^2
        r_raw_fe = F.FE(r_raw, s, s.mask, s.p - 1)
        r_mont = F.fmul(r_raw_fe, F.fe_from_int(s, s.r, k_w.shape[1:]))
        kinv = F.finv(k_mont)
        sig = F.fmul(kinv, z_mont + F.fmul(r_mont, d_mont))
        sig_raw = F.fto_raw_canonical(sig)
        # low-s normalization (IsHigh + negate, cf. k256 ecdsa.rs:192-197)
        half = int_to_limbs(s.p // 2 + 1, s.n_limbs, s.limb_bits)
        _, s_high = F._cond_sub(s, sig_raw, half)
        neg = F.fcanonical(F.fneg(F.FE(sig_raw, s, s.mask, s.p - 1))).limbs
        flip = jnp.logical_and(s_high, low_s)
        sig_out = jnp.where(flip, neg, sig_raw)
        recid = ((y_odd ^ flip).astype(U32)
                 | (r_overflow.astype(U32) << np.uint32(1)))
        r_zero = jnp.all(r_raw == 0, axis=0)
        s_zero = jnp.all(sig_raw == 0, axis=0)
        pack = lambda limbs: F.relimb(limbs, s.limb_bits, 32, nww)  # noqa: E731
        return jnp.concatenate([
            pack(r_raw), pack(sig_out), recid[None],
            (r_zero | s_zero).astype(U32)[None]], axis=0)

    return core


@functools.lru_cache(maxsize=None)
def _verify_core(curve: CurveSpec):
    """All-device verify: unpack words, Montgomery-encode, invert s, lincomb
    u1*G + u2*Q, projective x==r check. Word-packed IO keeps the slow
    host<->device link to ~40 bytes/signature each way."""
    f = curve.field
    s = curve.scalar
    fbits, sbits = f.bits, s.bits

    nwf = (fbits + 31) // 32
    nws = (sbits + 31) // 32

    @jax.jit
    def core(buf):
        """buf: one [2*nwf + 3*nws + 1, B] uint32 array — a single H2D
        transfer (the link has ~30ms per-transfer latency)."""
        bshape = buf.shape[1:]
        o = 0
        qx_w = buf[o:o + nwf]; o += nwf
        qy_w = buf[o:o + nwf]; o += nwf
        z_w = buf[o:o + nws]; o += nws
        r_w = buf[o:o + nws]; o += nws
        s_w = buf[o:o + nws]; o += nws
        rn_valid = buf[o] == 1
        qx = F.fe_from_words(f, qx_w, fbits)
        qy = F.fe_from_words(f, qy_w, fbits)
        # public-key curve-membership check INSIDE the library: an off-curve
        # (x, y) must not reach the lincomb (the reference rejects it at
        # decode, primeorder/src/affine.rs:164-195; here the batched entry
        # point accepts raw coordinates, so the check is fused into verify)
        rhs = F.fmul(F.fsquare(qx), qx)
        if curve.a != 0:
            rhs = rhs + F.fmul(F.fe_from_int(f, curve.a, bshape), qx)
        rhs = rhs + F.fe_from_int(f, curve.b, bshape)
        q_on_curve = F.feq(F.fsquare(qy), rhs)
        z_m = F.fe_from_words(s, z_w, sbits)
        r_m = F.fe_from_words(s, r_w, sbits)
        s_m = F.fe_from_words(s, s_w, sbits)
        sinv = F.finv(s_m)
        u1 = F.fto_raw_canonical(F.fmul(z_m, sinv))
        u2 = F.fto_raw_canonical(F.fmul(r_m, sinv))
        Q = P.from_affine(curve, qx, qy)
        G = P.generator(curve, bshape)
        # k256 routes through the GLV split (the reference's verify always
        # does, k256/src/arithmetic/mul.rs:443-445); others run the plain
        # full-width Straus lincomb.
        R = SM.lincomb_auto([(G, u1), (Q, u2)])
        # r == x(R) mod n  <=>  X == r*Z or X == (r+n)*Z  (projective check)
        r_f = F.fe_from_words(f, r_w, sbits)
        n_f = F.fe_from_int(f, s.p % f.p, bshape)
        rn_f = r_f + n_f        # integer r+n when rn_valid (r+n < p)
        ok1 = F.feq(R.x, F.fmul(r_f, R.z))
        ok2 = jnp.logical_and(rn_valid, F.feq(R.x, F.fmul(rn_f, R.z)))
        not_inf = jnp.logical_not(P.is_identity(R))
        ok = jnp.logical_and(not_inf, jnp.logical_or(ok1, ok2))
        return jnp.logical_and(q_on_curve, ok)

    return core


# the chunked host<->device pipeline shared by all protocol shells lives in
# protocols/pipeline.py (generalized out of this file in round 5)


def sign_batch(curve: CurveSpec, d_ints, z_ints, k_ints=None, hashname=None,
               low_s=None, _raw_flags=False, chunk=None):
    """Batched deterministic ECDSA. Returns (r, s, recovery_id) int lists.

    Nonces come from RFC 6979 host-side (like the reference's SignPrimitive
    wiring); all field/group algebra runs batched on device with word-packed
    host<->device IO.
    """
    n = curve.n
    if curve.name in SIGN_UNSUPPORTED:
        raise NotImplementedError(
            f"{curve.name} is verify-only, matching the reference"
            " (p192/src/ecdsa.rs:36-51)")
    low_s = (curve.name in LOW_S_CURVES) if low_s is None else low_s
    hashname = hashname or CURVE_HASH[curve.name]
    caller_k = k_ints is not None
    s = curve.scalar
    nb = (n.bit_length() + 7) // 8
    core = _sign_core(curve, bool(low_s))

    def prep(sl):
        """Host work for one chunk: nonces + ONE packed input buffer."""
        z_c = [z % n for z in z_ints[sl]]
        d_c = list(d_ints[sl])
        if caller_k:
            k_c = list(k_ints[sl])
        else:
            k_c = rfc6979.generate_k_batch(
                n, d_c, [int(z).to_bytes(nb, "big") for z in z_c], hashname)
        return np.concatenate(
            [F.words_from_ints(v, s.bits) for v in (k_c, z_c, d_c)], axis=0)

    pad = np.concatenate(
        [F.words_from_ints([v], s.bits) for v in (1, 0, 1)], axis=0)
    packed = _run_pipelined(core, prep, len(d_ints), chunk, pad_col=pad)
    nww = (s.bits + 31) // 32
    rs = F.ints_from_words(packed[:nww])
    ss = F.ints_from_words(packed[nww:2 * nww])
    recid = packed[2 * nww]
    out = [(r_i, s_i, int(rc)) for r_i, s_i, rc in zip(rs, ss, recid)]
    if _raw_flags:
        return [sig + (bool(b),)
                for sig, b in zip(out, packed[2 * nww + 1])]
    bad = np.flatnonzero(packed[2 * nww + 1])
    if bad.size:
        # r == 0 or s == 0 (probability ~2^-250, but adversarially reachable
        # with a caller-chosen k): the reference re-enters the nonce loop
        # per call instead of failing (RFC 6979 §3.2 step h.3 / the ecdsa
        # crate's retry with added entropy). Re-sign only the bad lanes.
        if k_ints is not None:
            raise ValueError(f"r or s is zero for caller-supplied k at "
                             f"lanes {bad.tolist()[:8]}")
        nb = (n.bit_length() + 7) // 8
        for i in map(int, bad):
            retry, sig_i = 1, None
            while sig_i is None or sig_i[3]:
                k_i = rfc6979.generate_k(
                    n, d_ints[i], int(z_ints[i] % n).to_bytes(nb, "big"),
                    hashname, extra=retry.to_bytes(4, "big"))
                sig_i = sign_batch(curve, [d_ints[i]], [z_ints[i]],
                                   k_ints=[k_i], hashname=hashname,
                                   low_s=low_s, _raw_flags=True)[0]
                retry += 1
            out[i] = sig_i[:3]
    return out


def verify_batch(curve: CurveSpec, pub_pts, z_ints, sigs, low_s=None,
                 chunk=None):
    """Batched verify. pub_pts: list of (x, y); sigs: list of (r, s).
    Returns list[bool]. Host does only range/policy checks and word packing;
    all algebra (s^-1, u1/u2, lincomb, x==r, pubkey on-curve) runs on device,
    chunk-pipelined for big batches (_run_pipelined).

    Public-key validation happens HERE, not in the caller: coordinates out
    of [0, p) are rejected host-side (a value >= p would alias mod p on
    device), curve membership is checked on device inside the verify core
    (the reference enforces both at decode, primeorder/src/affine.rs:164-195).
    """
    n, p = curve.n, curve.p
    low_s = (curve.name in LOW_S_CURVES) if low_s is None else low_s
    s = curve.scalar
    f = curve.field
    pre_ok = []

    def prep(sl):
        r_l, s_l, z_l, rn_valid, qx_l, qy_l = [], [], [], [], [], []
        for (r, sg), z, (qx, qy) in zip(sigs[sl], z_ints[sl], pub_pts[sl]):
            ok = 0 < r < n and 0 < sg < n
            if not (0 <= qx < p and 0 <= qy < p):
                ok = False
            if low_s and sg > n // 2:
                ok = False
            pre_ok.append(ok)
            r_l.append(r if ok else 1)
            s_l.append(sg if ok else 1)
            qx_l.append(qx if ok else curve.gx)
            qy_l.append(qy if ok else curve.gy)
            z_l.append(z % n)
            rn_valid.append(r + n < p)
        return np.concatenate([
            F.words_from_ints(qx_l, f.bits),
            F.words_from_ints(qy_l, f.bits),
            F.words_from_ints(z_l, s.bits),
            F.words_from_ints(r_l, s.bits),
            F.words_from_ints(s_l, s.bits),
            np.array(rn_valid, np.uint32)[None],
        ], axis=0)

    pad = np.concatenate([
        F.words_from_ints([curve.gx], f.bits),
        F.words_from_ints([curve.gy], f.bits),
        F.words_from_ints([0], s.bits),
        F.words_from_ints([1], s.bits),
        F.words_from_ints([1], s.bits),
        np.ones((1, 1), np.uint32),
    ], axis=0)
    core = _verify_core(curve)
    raw = _run_pipelined(core, prep, len(sigs), chunk, pad_col=pad)
    return [bool(a and b) for a, b in zip(pre_ok, raw[0])]


def _unpack_raw(spec, raw) -> list[int]:
    from ..utils.bigint import limbs_np_to_ints
    return limbs_np_to_ints(np.asarray(jax.device_get(raw)), spec.limb_bits)


@functools.lru_cache(maxsize=None)
def _recover_core(curve: CurveSpec):
    """Batched device recovery: decompress R from (x, y-parity) with a
    batched sqrt, then Q = r^-1 (s*R - z*G) as one lincomb (the device
    analogue of VerifyingKey::recover_from_prehash, k256/src/ecdsa.rs)."""
    f = curve.field
    s = curve.scalar
    fbits, sbits = f.bits, s.bits
    nwf = (fbits + 31) // 32
    nws = (sbits + 31) // 32

    @jax.jit
    def core(buf):
        """buf: [nwf + 3*nws + 1, B] uint32 — x words, z/r/s words, y_odd."""
        bshape = buf.shape[1:]
        o = 0
        x_w = buf[o:o + nwf]; o += nwf
        z_w = buf[o:o + nws]; o += nws
        r_w = buf[o:o + nws]; o += nws
        s_w = buf[o:o + nws]; o += nws
        want_odd = buf[o] == 1
        x = F.fe_from_words(f, x_w, fbits)
        # decompress: y = sqrt(x^3 + a x + b), then match the parity bit
        rhs = F.fmul(F.fsquare(x), x)
        if curve.a != 0:
            rhs = rhs + F.fmul(F.fe_from_int(f, curve.a, bshape), x)
        rhs = rhs + F.fe_from_int(f, curve.b, bshape)
        y, is_sq = F.fsqrt(rhs)
        y_odd = (F.fto_raw_canonical(y)[0] & np.uint32(1)) == 1
        y = F.fselect(y_odd != want_odd, F.fneg(y), y)
        # u1 = -z r^-1, u2 = s r^-1 (mod n)
        z_m = F.fe_from_words(s, z_w, sbits)
        r_m = F.fe_from_words(s, r_w, sbits)
        s_m = F.fe_from_words(s, s_w, sbits)
        rinv = F.finv(r_m)
        u1 = F.fto_raw_canonical(F.fmul(F.fneg(z_m), rinv))
        u2 = F.fto_raw_canonical(F.fmul(s_m, rinv))
        Rp = P.from_affine(curve, x, y)
        G = P.generator(curve, bshape)
        Q = SM.lincomb_auto([(G, u1), (Rp, u2)])
        qx, qy, inf = P.to_affine(Q)
        ok = jnp.logical_and(is_sq, jnp.logical_not(inf))
        # one packed output = one D2H fetch (~30ms/round-trip tunnel)
        return jnp.concatenate(
            [F.fe_to_words(qx), F.fe_to_words(qy), ok.astype(U32)[None]],
            axis=0)

    return core


def recover_batch(curve: CurveSpec, z_ints, sigs, chunk=None):
    """Batched public-key recovery on device. sigs: list of (r, s, recid).
    Returns list of affine (x, y) or None (k256 RecoveryId semantics:
    bit 0 = y parity, bit 1 = x overflowed the order)."""
    n, p = curve.n, curve.p
    f = curve.field
    s = curve.scalar
    pre_ok = []

    def prep(sl_):
        xs, zs, rl, sl, odd = [], [], [], [], []
        for (r, sg, recid), z in zip(sigs[sl_], z_ints[sl_]):
            x = r + (n if recid & 2 else 0)
            ok = 0 < r < n and 0 < sg < n and x < p
            pre_ok.append(ok)
            xs.append(x if ok else curve.gx)
            rl.append(r if ok else 1)
            sl.append(sg if ok else 1)
            zs.append(z % n)
            odd.append(recid & 1)
        return np.concatenate([
            F.words_from_ints(xs, f.bits),
            F.words_from_ints(zs, s.bits),
            F.words_from_ints(rl, s.bits),
            F.words_from_ints(sl, s.bits),
            np.array(odd, np.uint32)[None],
        ], axis=0)

    pad = np.concatenate([
        F.words_from_ints([curve.gx], f.bits),
        F.words_from_ints([0], s.bits),
        F.words_from_ints([1], s.bits),
        F.words_from_ints([1], s.bits),
        np.zeros((1, 1), np.uint32),
    ], axis=0)
    packed = _run_pipelined(_recover_core(curve), prep, len(sigs), chunk,
                            pad_col=pad)
    nwf = (f.bits + 31) // 32
    qxs = F.ints_from_words(packed[:nwf])
    qys = F.ints_from_words(packed[nwf:2 * nwf])
    ok = packed[2 * nwf]
    return [(qx, qy) if (pok and bool(o)) else None
            for qx, qy, pok, o in zip(qxs, qys, pre_ok, ok)]


def recover_public_key(curve: CurveSpec, z: int, r: int, s: int, recid: int):
    """Single-shot public-key recovery (delegates to the batched device
    path; cf. k256/src/ecdsa.rs RecoveryId + recover_from_prehash)."""
    return recover_batch(curve, [z], [(r, s, recid)])[0]


# ---------------------------------------------------------------------------
# host key API (the reference's SigningKey/VerifyingKey layer)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class SigningKey:
    curve: CurveSpec
    d: int

    @classmethod
    def random(cls, curve_name: str, rng) -> "SigningKey":
        c = get_curve(curve_name)
        return cls(c, rng.randrange(1, c.n))

    @classmethod
    def from_bytes(cls, curve_name: str, data: bytes) -> "SigningKey":
        c = get_curve(curve_name)
        d = be_bytes_to_int(data)
        if not 0 < d < c.n:
            raise ValueError("invalid secret scalar")
        return cls(c, d)

    def to_bytes(self) -> bytes:
        return int(self.d).to_bytes((self.curve.scalar.bits + 7) // 8, "big")

    def verifying_key(self) -> "VerifyingKey":
        # ct device comb — never the vartime host ladder — on the secret d
        # (k256/src/arithmetic/mul.rs:424-439; DESIGN.md ct policy)
        return VerifyingKey(self.curve, SM.derive_public(self.curve, self.d))

    def sign_prehash(self, digest: bytes):
        z = digest_to_z(self.curve, digest)
        (r, s, recid), = sign_batch(self.curve, [self.d], [z])
        return r, s, recid

    def sign(self, msg: bytes, hashname=None) -> bytes:
        digest = hash_msg(self.curve, msg, hashname)
        r, s, _ = self.sign_prehash(digest)
        return der.sig_to_der(r, s)

    def sign_recoverable(self, msg: bytes, hashname=None):
        digest = hash_msg(self.curve, msg, hashname)
        return self.sign_prehash(digest)


@dataclasses.dataclass
class VerifyingKey:
    curve: CurveSpec
    point: tuple  # affine (x, y)

    @classmethod
    def from_sec1_bytes(cls, curve_name: str, data: bytes) -> "VerifyingKey":
        c = get_curve(curve_name)
        pt = sec1.decode_point(c, data)
        if pt is None:
            raise ValueError("identity is not a valid public key")
        return cls(c, pt)

    def to_sec1_bytes(self, compress: bool = True) -> bytes:
        return sec1.encode_point(self.curve, self.point, compress)

    def verify_prehash(self, digest: bytes, r: int, s: int) -> bool:
        z = digest_to_z(self.curve, digest)
        return verify_batch(self.curve, [self.point], [z], [(r, s)])[0]

    def verify(self, msg: bytes, sig_der: bytes, hashname=None) -> bool:
        try:
            r, s = der.der_to_sig(sig_der)
        except der.DerError:
            return False
        digest = hash_msg(self.curve, msg, hashname)
        return self.verify_prehash(digest, r, s)
