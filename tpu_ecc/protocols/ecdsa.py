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
from ..utils import ec_host
from ..utils.bigint import be_bytes_to_int
from ..ops import fe as F
from ..ops import points as P
from ..ops import scalarmul as SM
from . import rfc6979

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


def digest_to_z(curve: CurveSpec, digest: bytes) -> int:
    """bits2int: leftmost qlen bits (the ecdsa crate's bits2field,
    p521/src/ecdsa.rs:48-82 uses this for 512-bit digests vs 521-bit n)."""
    return rfc6979.bits2int(digest, curve.n.bit_length()) % curve.n


# ---------------------------------------------------------------------------
# batched device cores (jitted per (curve, batch-size))
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _sign_core(curve: CurveSpec):
    from ..utils.bigint import int_to_limbs

    s = curve.scalar
    f = curve.field

    @jax.jit
    def core(k_raw, k_mont, z_mont, d_mont):
        R = SM.mul_by_generator(curve, k_raw)
        x_aff, y_aff, _ = P.to_affine(R)
        r_raw, r_overflow = F.field_to_scalar_raw(f, s, x_aff)
        # y parity of the affine y (canonical integer-domain limb 0, bit 0)
        y_raw = F.fto_raw_canonical(y_aff)
        y_odd = (y_raw[0] & np.uint32(1)) == 1
        # s = k^-1 (z + r d) in the Montgomery scalar field; r enters the
        # Montgomery domain by multiplying its raw limbs with R^2/R = R.
        r_raw_fe = F.FE(r_raw, s, s.mask, s.p - 1)
        r_mont = F.fmul(r_raw_fe, F.fe_from_int(s, s.r, k_raw.shape[1:]))
        kinv = F.finv(k_mont)
        sig = F.fmul(kinv, z_mont + F.fmul(r_mont, d_mont))
        sig_raw = F.fto_raw_canonical(sig)
        # low-s data: s > n/2 test and n - s (for IsHigh + normalize_s,
        # cf. k256 scalar.rs IsHigh / ecdsa.rs:192-197)
        half = int_to_limbs(s.p // 2 + 1, s.n_limbs, s.limb_bits)
        _, s_high = F._cond_sub(s, sig_raw, half)
        # n - s on raw-domain limbs (fcanonical is domain-agnostic; must NOT
        # apply the Montgomery decode of fto_raw_canonical here)
        neg = F.fcanonical(F.fneg(F.FE(sig_raw, s, s.mask, s.p - 1))).limbs
        r_zero = jnp.all(r_raw == 0, axis=0)
        s_zero = jnp.all(sig_raw == 0, axis=0)
        return r_raw, sig_raw, neg, s_high, y_odd, r_overflow, r_zero | s_zero

    return core


@functools.lru_cache(maxsize=None)
def _verify_core(curve: CurveSpec, nterms: int, scalar_bits):
    """Batched R = sum(k_t * P_t) + projective x == r check.

    u1/u2 (public) are computed host-side; for secp256k1 the caller GLV-splits
    them into 4 half-width terms (endomorphism points precomputed on the host),
    halving the shared-doubling count (k256/src/arithmetic/mul.rs:342-393)."""
    f = curve.field

    @jax.jit
    def core(px_l, py_l, k_l, r_f, rn_f, rn_valid):
        terms = []
        for t in range(nterms):
            pt = P.from_affine(curve, F.fe_steady(f, px_l[t]),
                               F.fe_steady(f, py_l[t]))
            terms.append((pt, k_l[t]))
        R = SM.lincomb(terms, scalar_bits)
        # r == x(R) mod n  <=>  X == r*Z or X == (r+n)*Z  (projective check)
        ok1 = F.feq(R.x, F.fmul(r_f, R.z))
        ok2 = jnp.logical_and(rn_valid, F.feq(R.x, F.fmul(rn_f, R.z)))
        not_inf = jnp.logical_not(P.is_identity(R))
        return jnp.logical_and(not_inf, jnp.logical_or(ok1, ok2))

    return core


def _lincomb_terms_host(curve: CurveSpec, pub_pts, u1s, u2s):
    """Build per-element term points/scalars for the verify lincomb.
    Returns (pts [T][(x,y) lists], scalars [T][ints], scalar_bits)."""
    n, p = curve.n, curve.p
    G = (curve.gx, curve.gy)
    if not curve.glv:
        pts = [[G] * len(u1s), pub_pts]
        return pts, [list(u1s), list(u2s)], None
    beta = curve.glv["beta"]
    t_pts = [[], [], [], []]
    t_ks = [[], [], [], []]
    for Q, u1, u2 in zip(pub_pts, u1s, u2s):
        for base, u, slot in ((G, u1, 0), (Q, u2, 2)):
            k1, s1, k2, s2 = SM.glv_decompose(curve, u)
            ex = (base[0] * beta) % p
            t_pts[slot].append((base[0], base[1] if s1 > 0 else p - base[1]))
            t_ks[slot].append(k1)
            t_pts[slot + 1].append((ex, base[1] if s2 > 0 else p - base[1]))
            t_ks[slot + 1].append(k2)
    return t_pts, t_ks, 132


def sign_batch(curve: CurveSpec, d_ints, z_ints, k_ints=None, hashname=None,
               low_s=None):
    """Batched deterministic ECDSA. Returns (r, s, recovery_id) int lists.

    Nonces come from RFC 6979 host-side (like the reference's SignPrimitive
    wiring); all field/group algebra runs batched on device.
    """
    n = curve.n
    if curve.name in SIGN_UNSUPPORTED:
        raise NotImplementedError(
            f"{curve.name} is verify-only, matching the reference"
            " (p192/src/ecdsa.rs:36-51)")
    low_s = (curve.name in LOW_S_CURVES) if low_s is None else low_s
    hashname = hashname or CURVE_HASH[curve.name]
    if k_ints is None:
        k_ints = [
            rfc6979.generate_k(
                n, d, int(z).to_bytes((n.bit_length() + 7) // 8, "big"), hashname)
            for d, z in zip(d_ints, z_ints)
        ]
    s = curve.scalar
    k_raw = SM.pack_scalars(curve, k_ints)
    k_mont = F.fe_from_ints(s, k_ints)
    z_mont = F.fe_from_ints(s, z_ints)
    d_mont = F.fe_from_ints(s, d_ints)
    core = _sign_core(curve)
    r_raw, s_raw, s_neg, s_high, y_odd, r_ovf, bad = core(
        k_raw, k_mont, z_mont, d_mont)
    rs = _unpack_raw(s, r_raw)
    ss = _unpack_raw(s, s_raw)
    sn = _unpack_raw(s, s_neg)
    s_high = np.asarray(s_high)
    y_odd = np.asarray(y_odd)
    r_ovf = np.asarray(r_ovf)
    assert not np.asarray(bad).any(), "r or s is zero (re-sign with fresh k)"
    out = []
    for i in range(len(rs)):
        r_i, s_i = rs[i], ss[i]
        y_o = bool(y_odd[i])
        if low_s and s_high[i]:
            s_i = sn[i]
            y_o = not y_o
        recid = int(y_o) | (int(bool(r_ovf[i])) << 1)
        out.append((r_i, s_i, recid))
    return out


def verify_batch(curve: CurveSpec, pub_pts, z_ints, sigs, low_s=None):
    """Batched verify. pub_pts: list of (x, y); sigs: list of (r, s).
    Returns list[bool]. Public per-signature scalar algebra (u1 = z/s,
    u2 = r/s, GLV splitting) runs host-side; the scalar-mul work is batched
    on device."""
    n, p = curve.n, curve.p
    low_s = (curve.name in LOW_S_CURVES) if low_s is None else low_s
    f = curve.field
    pre_ok, r_l, u1_l, u2_l = [], [], [], []
    for (r, sg), z in zip(sigs, z_ints):
        ok = 0 < r < n and 0 < sg < n
        if low_s and sg > n // 2:
            ok = False
        pre_ok.append(ok)
        r_l.append(r if ok else 1)
        sinv = pow(sg, -1, n) if ok else 1
        u1_l.append((z * sinv) % n)
        u2_l.append((r * sinv) % n if ok else 1)
    t_pts, t_ks, sbits = _lincomb_terms_host(curve, pub_pts, u1_l, u2_l)
    T = len(t_pts)
    px_l = jnp.stack([F.fe_from_ints(f, [q[0] for q in pts]).limbs
                      for pts in t_pts])
    py_l = jnp.stack([F.fe_from_ints(f, [q[1] for q in pts]).limbs
                      for pts in t_pts])
    k_l = jnp.stack([SM.pack_scalars(curve, ks) for ks in t_ks])
    r_f = F.fe_from_ints(f, r_l)
    rn_valid = np.array([r + n < p for r in r_l])
    rn_f = F.fe_from_ints(f, [(r + n) % p for r in r_l])
    core = _verify_core(curve, T, sbits)
    ok = np.asarray(core(px_l, py_l, k_l, r_f, rn_f, jnp.asarray(rn_valid)))
    return [bool(a and b) for a, b in zip(pre_ok, ok)]


def _unpack_raw(spec, raw) -> list[int]:
    from ..utils.bigint import limbs_np_to_ints
    return limbs_np_to_ints(np.asarray(jax.device_get(raw)), spec.limb_bits)


def recover_public_key(curve: CurveSpec, z: int, r: int, s: int, recid: int):
    """Public-key recovery from a signature (k256 RecoveryId semantics,
    cf. k256/src/ecdsa.rs public-key recovery). Host-side (single-shot)."""
    n, p = curve.n, curve.p
    x = r + (n if recid & 2 else 0)
    if x >= p:
        return None
    pt = ec_host.decompress(curve, x, bool(recid & 1))
    if pt is None:
        return None
    rinv = pow(r, -1, n)
    u1 = (-z * rinv) % n
    u2 = (s * rinv) % n
    G = ec_host.aff_generator(curve)
    Q = ec_host.aff_add(curve, ec_host.aff_mul(curve, u1, G),
                        ec_host.aff_mul(curve, u2, pt))
    return Q


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
        pt = ec_host.aff_mul(self.curve, self.d, ec_host.aff_generator(self.curve))
        return VerifyingKey(self.curve, pt)

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
