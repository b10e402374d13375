"""SM2 digital signature (GB/T 32918), matching the reference sm2 crate.

- Z_A distinguishing-identifier hash (sm2/src/distid.rs:22-44)
- sign: e=SM3(Z||M), RFC6979-SM3 k, r=(e+x1) mod n, s=(1+d)^-1 (k - r d)
  (sm2/src/dsa/signing.rs:185-220)
- verify: t=r+s, (x1,y1)=[s]G+[t]P, check r == e+x1 (dsa/verifying.rs:131-165)

Device: mul_by_generator / lincomb + batched scalar-field algebra.
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
from . import rfc6979

DEFAULT_ID = b"1234567812345678"


def sm3(data: bytes) -> bytes:
    return hashlib.new("sm3", data).digest()


def z_a(curve: CurveSpec, pub_pt, ident: bytes = DEFAULT_ID) -> bytes:
    """Z_A = SM3(ENTL || id || a || b || Gx || Gy || Px || Py)."""
    fb = curve.field_bytes
    entl = (len(ident) * 8).to_bytes(2, "big")
    data = (entl + ident
            + int_to_be_bytes(curve.a, fb) + int_to_be_bytes(curve.b, fb)
            + int_to_be_bytes(curve.gx, fb) + int_to_be_bytes(curve.gy, fb)
            + int_to_be_bytes(pub_pt[0], fb) + int_to_be_bytes(pub_pt[1], fb))
    return sm3(data)


def hash_msg(curve: CurveSpec, pub_pt, msg: bytes, ident: bytes = DEFAULT_ID) -> bytes:
    return sm3(z_a(curve, pub_pt, ident) + msg)


@functools.lru_cache(maxsize=None)
def _sign_core(curve: CurveSpec):
    s = curve.scalar
    f = curve.field

    @jax.jit
    def core(k_raw, k_mont, e_mont, d_mont):
        R = SM.mul_by_generator(curve, k_raw)
        x1, _, _ = P.to_affine(R)
        x1_raw, _ = F.field_to_scalar_raw(f, s, x1)
        x1_mont = F.fmul(F.FE(x1_raw, s, s.mask, s.p - 1),
                         F.fe_from_int(s, s.r, k_raw.shape[1:]))
        r = e_mont + x1_mont
        one = F.fone(s, k_raw.shape[1:])
        dp1_inv = F.finv(d_mont + one)
        sig = F.fmul(dp1_inv, F.fsub(k_mont, F.fmul(r, d_mont)))
        r_raw = F.fto_raw_canonical(r)
        s_raw = F.fto_raw_canonical(sig)
        r_zero = jnp.all(r_raw == 0, axis=0)
        s_zero = jnp.all(s_raw == 0, axis=0)
        # r + k == n check (A5): r + k == 0 mod n
        rk_zero = jnp.all(F.fto_raw_canonical(r + k_mont) == 0, axis=0)
        nww = (s.bits + 31) // 32
        pack = lambda l: F.relimb(l, s.limb_bits, 32, nww)  # noqa: E731
        # one packed output = one D2H fetch (~30ms/round-trip tunnel)
        return jnp.concatenate(
            [pack(r_raw), pack(s_raw),
             (r_zero | s_zero | rk_zero).astype(jnp.uint32)[None]], axis=0)

    return core


@functools.lru_cache(maxsize=None)
def _verify_core(curve: CurveSpec):
    s = curve.scalar
    f = curve.field

    @jax.jit
    def core(qx, qy, s_raw, t_raw, re_mont):
        """(x1,y1) = [s]G + [t]P; ok iff r - e == x1 mod n (re = r - e)."""
        Q = P.from_affine(curve, qx, qy)
        G = P.generator(curve, qx.batch_shape)
        R = SM.lincomb([(G, s_raw), (Q, t_raw)])
        x1, _, inf = P.to_affine(R)
        x1_raw, _ = F.field_to_scalar_raw(f, s, x1)
        x1_mont = F.fmul(F.FE(x1_raw, s, s.mask, s.p - 1),
                         F.fe_from_int(s, s.r, qx.batch_shape))
        return jnp.logical_and(jnp.logical_not(inf), F.feq(re_mont, x1_mont))

    return core


def sign_batch(curve: CurveSpec, d_ints, e_ints, k_ints=None):
    """Batched SM2 sign over prehashed e = SM3(Z||M). Returns [(r, s)]."""
    n = curve.n
    s = curve.scalar
    if k_ints is None:
        k_ints = [
            rfc6979.generate_k(n, d, int_to_be_bytes(e % n, (n.bit_length() + 7) // 8),
                               "sm3")
            for d, e in zip(d_ints, e_ints)
        ]
    core = _sign_core(curve)
    packed = np.asarray(core(                     # ONE D2H fetch
        SM.pack_scalars(curve, k_ints), F.fe_from_ints(s, k_ints),
        F.fe_from_ints(s, [e % n for e in e_ints]), F.fe_from_ints(s, d_ints)))
    nww = (s.bits + 31) // 32
    assert not packed[2 * nww].any(), "degenerate SM2 signature; retry with new k"
    rs = F.ints_from_words(packed[:nww])
    ss = F.ints_from_words(packed[nww:2 * nww])
    return list(zip(rs, ss))


def verify_batch(curve: CurveSpec, pub_pts, e_ints, sigs):
    n = curve.n
    s = curve.scalar
    f = curve.field
    pre_ok, s_l, t_l, re_l = [], [], [], []
    for (r, sg), e in zip(sigs, e_ints):
        t = (r + sg) % n
        ok = 0 < r < n and 0 < sg < n and t != 0
        pre_ok.append(ok)
        s_l.append(sg if ok else 1)
        t_l.append(t if ok else 1)
        re_l.append((r - e) % n)
    qx = F.fe_from_ints(f, [q[0] for q in pub_pts])
    qy = F.fe_from_ints(f, [q[1] for q in pub_pts])
    ok = np.asarray(_verify_core(curve)(
        qx, qy, SM.pack_scalars(curve, s_l), SM.pack_scalars(curve, t_l),
        F.fe_from_ints(s, re_l)))
    return [bool(a and b) for a, b in zip(pre_ok, ok)]


# ---------------------------------------------------------------------------
# host key API (sm2/src/dsa.rs SigningKey/VerifyingKey analogues)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class SigningKey:
    curve: CurveSpec
    d: int
    ident: bytes = DEFAULT_ID

    @classmethod
    def from_bytes(cls, data: bytes, ident: bytes = DEFAULT_ID) -> "SigningKey":
        c = get_curve("sm2")
        d = be_bytes_to_int(data)
        if not 0 < d < c.n:
            raise ValueError("invalid secret")
        return cls(c, d, ident)

    def public_point(self):
        return ec_host.aff_mul(self.curve, self.d, ec_host.aff_generator(self.curve))

    def verifying_key(self) -> "VerifyingKey":
        return VerifyingKey(self.curve, self.public_point(), self.ident)

    def sign(self, msg: bytes):
        e = be_bytes_to_int(hash_msg(self.curve, self.public_point(), msg,
                                     self.ident))
        ((r, s),) = sign_batch(self.curve, [self.d], [e])
        return r, s


@dataclasses.dataclass
class VerifyingKey:
    curve: CurveSpec
    point: tuple
    ident: bytes = DEFAULT_ID

    def verify(self, msg: bytes, r: int, s: int) -> bool:
        e = be_bytes_to_int(hash_msg(self.curve, self.point, msg, self.ident))
        return verify_batch(self.curve, [self.point], [e], [(r, s)])[0]
