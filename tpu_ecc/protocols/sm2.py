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
from ..utils.bigint import int_to_be_bytes, be_bytes_to_int
from ..ops import fe as F
from ..ops import points as P
from ..ops import scalarmul as SM
from . import rfc6979
from .pipeline import run_pipelined as _run_pipelined

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


def hash_msg_batch(curve: CurveSpec, pub_pts, msgs,
                   ident: bytes = DEFAULT_ID) -> list:
    """Batched e = SM3(Z_A || M): both SM3 passes ride the native C++
    sm3_batch kernel (tpu_ecc/native/fastcrypt.cpp) when shapes are uniform;
    falls back per message otherwise."""
    from ..native import sm3_batch

    fb = curve.field_bytes
    entl = (len(ident) * 8).to_bytes(2, "big")
    const = (entl + ident
             + int_to_be_bytes(curve.a, fb) + int_to_be_bytes(curve.b, fb)
             + int_to_be_bytes(curve.gx, fb) + int_to_be_bytes(curve.gy, fb))
    zin = [const + int_to_be_bytes(q[0], fb) + int_to_be_bytes(q[1], fb)
           for q in pub_pts]
    zs = sm3_batch(zin, len(zin[0])) if len(zin) > 1 else None
    if zs is None:
        zs = [sm3(d) for d in zin]
    ein = [z + m for z, m in zip(zs, msgs)]
    if len(ein) > 1 and len({len(x) for x in ein}) == 1:
        es = sm3_batch(ein, len(ein[0]))
        if es is not None:
            return es
    return [sm3(x) for x in ein]


@functools.lru_cache(maxsize=None)
def _sign_core(curve: CurveSpec):
    s = curve.scalar
    f = curve.field
    sbits = s.bits
    nws = (sbits + 31) // 32

    @jax.jit
    def core(buf):
        """Packed-word IO (protocols/pipeline.py): buf [3*nws, B] = k | e |
        d words; output [2*nws + 1, B] = r | s | bad."""
        bshape = buf.shape[1:]
        k_w = buf[:nws]
        e_w = buf[nws:2 * nws]
        d_w = buf[2 * nws:3 * nws]
        k_raw = F.relimb(k_w, 32, s.limb_bits, s.n_limbs)
        k_mont = F.fe_from_words(s, k_w, sbits)
        e_mont = F.fe_from_words(s, e_w, sbits)
        d_mont = F.fe_from_words(s, d_w, sbits)
        R = SM.mul_by_generator(curve, k_raw)
        x1, _, _ = P.to_affine(R)
        x1_raw, _ = F.field_to_scalar_raw(f, s, x1)
        x1_mont = F.fmul(F.FE(x1_raw, s, s.mask, s.p - 1),
                         F.fe_from_int(s, s.r, bshape))
        r = e_mont + x1_mont
        one = F.fone(s, bshape)
        dp1_inv = F.finv(d_mont + one)
        sig = F.fmul(dp1_inv, F.fsub(k_mont, F.fmul(r, d_mont)))
        r_raw = F.fto_raw_canonical(r)
        s_raw = F.fto_raw_canonical(sig)
        r_zero = jnp.all(r_raw == 0, axis=0)
        s_zero = jnp.all(s_raw == 0, axis=0)
        # r + k == n check (A5): r + k == 0 mod n
        rk_zero = jnp.all(F.fto_raw_canonical(r + k_mont) == 0, axis=0)
        pack = lambda l: F.relimb(l, s.limb_bits, 32, nws)  # noqa: E731
        return jnp.concatenate(
            [pack(r_raw), pack(s_raw),
             (r_zero | s_zero | rk_zero).astype(jnp.uint32)[None]], axis=0)

    return core


@functools.lru_cache(maxsize=None)
def _verify_core(curve: CurveSpec):
    s = curve.scalar
    f = curve.field
    fbits, sbits = f.bits, s.bits
    nwf = (fbits + 31) // 32
    nws = (sbits + 31) // 32

    @jax.jit
    def core(buf):
        """(x1,y1) = [s]G + [t]P; ok iff r - e == x1 mod n (re = r - e).
        buf [2*nwf + 3*nws, B] = qx | qy | s | t | re words. Public-key
        curve membership is checked on device (the reference rejects
        off-curve keys at decode, primeorder/src/affine.rs:164-195)."""
        bshape = buf.shape[1:]
        o = 0
        qx_w = buf[o:o + nwf]; o += nwf
        qy_w = buf[o:o + nwf]; o += nwf
        s_w = buf[o:o + nws]; o += nws
        t_w = buf[o:o + nws]; o += nws
        re_w = buf[o:o + nws]; o += nws
        qx = F.fe_from_words(f, qx_w, fbits)
        qy = F.fe_from_words(f, qy_w, fbits)
        rhs = F.fmul(F.fsquare(qx), qx)
        rhs = rhs + F.fmul(F.fe_from_int(f, curve.a, bshape), qx)
        rhs = rhs + F.fe_from_int(f, curve.b, bshape)
        q_on_curve = F.feq(F.fsquare(qy), rhs)
        s_raw = F.relimb(s_w, 32, s.limb_bits, s.n_limbs)
        t_raw = F.relimb(t_w, 32, s.limb_bits, s.n_limbs)
        re_mont = F.fe_from_words(s, re_w, sbits)
        Q = P.from_affine(curve, qx, qy)
        G = P.generator(curve, bshape)
        R = SM.lincomb([(G, s_raw), (Q, t_raw)])
        x1, _, inf = P.to_affine(R)
        x1_raw, _ = F.field_to_scalar_raw(f, s, x1)
        x1_mont = F.fmul(F.FE(x1_raw, s, s.mask, s.p - 1),
                         F.fe_from_int(s, s.r, bshape))
        ok = jnp.logical_and(jnp.logical_not(inf), F.feq(re_mont, x1_mont))
        return jnp.logical_and(q_on_curve, ok)

    return core


def sign_batch(curve: CurveSpec, d_ints, e_ints, k_ints=None, chunk=None,
               _raw_flags=False):
    """Batched SM2 sign over prehashed e = SM3(Z||M). Returns [(r, s)].

    Chunk-pipelined (protocols/pipeline.py) with RFC6979-SM3 nonces riding
    the native C++ kernel. Degenerate lanes (r=0 / s=0 / r+k=n; GB/T 32918
    steps A5/A6) retry PER LANE with RFC 6979 extra data — never a
    batch-wide failure (the reference fails per call,
    sm2/src/dsa/signing.rs:185-220)."""
    n = curve.n
    s = curve.scalar
    nb = (n.bit_length() + 7) // 8
    caller_k = k_ints is not None

    def prep(sl):
        e_c = [e % n for e in e_ints[sl]]
        d_c = list(d_ints[sl])
        if caller_k:
            k_c = list(k_ints[sl])
        else:
            k_c = rfc6979.generate_k_batch(
                n, d_c, [int(e).to_bytes(nb, "big") for e in e_c], "sm3")
        return np.concatenate(
            [F.words_from_ints(v, s.bits) for v in (k_c, e_c, d_c)], axis=0)

    pad = np.concatenate(
        [F.words_from_ints([v], s.bits) for v in (1, 0, 1)], axis=0)
    packed = _run_pipelined(_sign_core(curve), prep, len(d_ints), chunk,
                            pad_col=pad)
    nws = (s.bits + 31) // 32
    rs = F.ints_from_words(packed[:nws])
    ss = F.ints_from_words(packed[nws:2 * nws])
    out = list(zip(rs, ss))
    if _raw_flags:
        return [sig + (bool(b),) for sig, b in zip(out, packed[2 * nws])]
    bad = np.flatnonzero(packed[2 * nws])
    if bad.size:
        if caller_k:
            raise ValueError(f"degenerate SM2 signature for caller-supplied"
                             f" k at lanes {bad.tolist()[:8]}")
        for i in map(int, bad):
            retry, sig_i = 1, None
            while sig_i is None or sig_i[2]:
                k_i = rfc6979.generate_k(
                    n, d_ints[i], int(e_ints[i] % n).to_bytes(nb, "big"),
                    "sm3", extra=retry.to_bytes(4, "big"))
                sig_i = sign_batch(curve, [d_ints[i]], [e_ints[i]],
                                   k_ints=[k_i], _raw_flags=True)[0]
                retry += 1
            out[i] = sig_i[:2]
    return out


def verify_batch(curve: CurveSpec, pub_pts, e_ints, sigs, chunk=None):
    """Batched SM2 verify, chunk-pipelined. Host does range checks and word
    packing; curve membership + all algebra run on device."""
    n, p = curve.n, curve.p
    s = curve.scalar
    f = curve.field
    pre_ok = []

    def prep(sl):
        s_l, t_l, re_l, qx_l, qy_l = [], [], [], [], []
        for (r, sg), e, (qx, qy) in zip(sigs[sl], e_ints[sl], pub_pts[sl]):
            t = (r + sg) % n
            ok = 0 < r < n and 0 < sg < n and t != 0
            if not (0 <= qx < p and 0 <= qy < p):
                ok = False
            pre_ok.append(ok)
            s_l.append(sg if ok else 1)
            t_l.append(t if ok else 1)
            re_l.append((r - e) % n)
            qx_l.append(qx if ok else curve.gx)
            qy_l.append(qy if ok else curve.gy)
        return np.concatenate([
            F.words_from_ints(qx_l, f.bits),
            F.words_from_ints(qy_l, f.bits),
            F.words_from_ints(s_l, s.bits),
            F.words_from_ints(t_l, s.bits),
            F.words_from_ints(re_l, s.bits)], axis=0)

    pad = np.concatenate([
        F.words_from_ints([curve.gx], f.bits),
        F.words_from_ints([curve.gy], f.bits),
        F.words_from_ints([1], s.bits),
        F.words_from_ints([1], s.bits),
        F.words_from_ints([0], s.bits)], axis=0)
    raw = _run_pipelined(_verify_core(curve), prep, len(sigs), chunk,
                         pad_col=pad)
    return [bool(a and b) for a, b in zip(pre_ok, raw[0])]


# ---------------------------------------------------------------------------
# host key API (sm2/src/dsa.rs SigningKey/VerifyingKey analogues)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class SigningKey:
    curve: CurveSpec
    d: int
    ident: bytes = DEFAULT_ID
    _pub: tuple | None = dataclasses.field(default=None, repr=False,
                                           compare=False)

    @classmethod
    def from_bytes(cls, data: bytes, ident: bytes = DEFAULT_ID) -> "SigningKey":
        c = get_curve("sm2")
        d = be_bytes_to_int(data)
        if not 0 < d < c.n:
            raise ValueError("invalid secret")
        return cls(c, d, ident)

    def public_point(self):
        # ct device comb on the secret d (DESIGN.md ct policy), cached so
        # each sign() doesn't re-derive it (Z_A needs the public point)
        if self._pub is None:
            self._pub = SM.derive_public(self.curve, self.d)
        return self._pub

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
