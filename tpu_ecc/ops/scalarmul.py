"""Batched scalar multiplication: fixed-window constant-time ladders.

- Variable-base: 4-bit fixed window with a 16-entry table and masked-sum
  constant-time lookup — the batched analogue of the reference's
  `ProjectivePoint::mul` (primeorder/src/projective.rs:106-150) and its
  ct-select LookupTable (k256/src/arithmetic/mul.rs:94-126). On TPU the
  "select" is a one-hot masked reduction over the table axis: constant-time by
  construction, no secret-indexed memory access exists at all.
- Fixed-base (mul_by_generator): host-precomputed radix-16 comb tables
  T[j][d] = d * 16^j * G, so k*G is a sum of `nw` mixed adds with zero
  doublings (cf. the reference's precomputed basepoint tables,
  k256/src/arithmetic/mul.rs:395-439).
- lincomb: shared-doubling multi-scalar sum(k_i * P_i) (Straus/Shamir), the
  ECDSA-verify hot path (k256/src/arithmetic/mul.rs:342-393).

Scalars enter as *canonical* little-endian limb arrays in the scalar field's
limb layout (never Montgomery-domain), packed via `pack_scalars`.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..curves.specs import CurveSpec
from ..utils.bigint import int_to_limbs
from ..utils import ec_host
from . import fe as F
from . import points as P
from .fe import U32
from .points import Point


def pack_scalars(curve: CurveSpec, ints, batch_shape=None) -> jax.Array:
    """Host ints -> canonical scalar limbs uint32[n_limbs, *batch]."""
    from ..utils.bigint import ints_to_limbs_np

    s = curve.scalar
    arr = ints_to_limbs_np([v % s.p for v in ints], s.n_limbs, s.limb_bits)
    if batch_shape is not None:
        arr = arr.reshape((s.n_limbs, *batch_shape))
    return jnp.asarray(arr)


def num_windows(curve: CurveSpec, scalar_bits=None) -> int:
    return -(-(scalar_bits or curve.scalar.bits) // 4)


def window_digits(curve: CurveSpec, k_limbs: jax.Array, scalar_bits=None) -> jax.Array:
    """Extract 4-bit windows, MSB first -> uint32[nw, *batch].

    Window j covers scalar bits [4j, 4j+4); limbs are 13/12-bit so a window can
    straddle two limbs (static shifts only — cf. Radix16Decomposition,
    k256/src/arithmetic/mul.rs:274-305).
    """
    s = curve.scalar
    b = s.limb_bits
    nw = num_windows(curve, scalar_bits)
    digs = []
    for j in range(nw):
        lo = 4 * j
        li, off = divmod(lo, b)
        d = k_limbs[li] >> np.uint32(off)
        if off > b - 4 and li + 1 < s.n_limbs:
            d = d | (k_limbs[li + 1] << np.uint32(b - off))
        digs.append(d & np.uint32(15))
    return jnp.stack(digs[::-1], axis=0)  # MSB first


# ---------------------------------------------------------------------------
# constant-time table lookup (one-hot masked sum over the table axis)
# ---------------------------------------------------------------------------

def _ct_lookup(tbl: jax.Array, digit: jax.Array) -> jax.Array:
    """tbl[k, ...] selected by digit[*batch] -> [...]; constant-time."""
    k = tbl.shape[0]
    shape = (k,) + (1,) * (tbl.ndim - 1)
    sel = jnp.arange(k, dtype=U32).reshape(shape) == digit
    return jnp.sum(jnp.where(sel, tbl, np.uint32(0)), axis=0, dtype=U32)


def _ladder_kernel_ok(curve: CurveSpec, batch_shape, terms: int = 1) -> bool:
    """Use the fused Mosaic ladder kernel (pallas_kernels.ladder_call) when
    the backend, curve backend, batch layout and VMEM table budget admit it;
    the XLA scan path below remains the portable/compile-cheap fallback (and
    the CPU test oracle the kernels are asserted bit-equal against)."""
    import os

    if os.environ.get("TPU_ECC_KERNELS", "1") == "0":
        return False
    if jax.default_backend() != "tpu":
        return False
    from . import pallas_kernels as PK

    return (PK._supported(curve) and PK.ladder_fits(curve, terms)
            and len(batch_shape) == 1 and batch_shape[0] % 128 == 0)


def _point_table(Q: Point, size: int = 16) -> jax.Array:
    """[O, Q, 2Q, .., (size-1)Q] as [size, 3, n, *batch] steady limb arrays
    (cf. table build in primeorder projective.rs:112-122)."""
    c = Q.curve
    Q = P.steady(Q)
    q_l = P.point_limbs(Q)

    def tstep(prev, _):
        nxt = P.point_limbs(P.steady(P.padd(P.point_from_limbs(c, prev), Q)))
        return nxt, nxt

    _, tail = jax.lax.scan(tstep, q_l, None, length=size - 2)
    ident = P.point_limbs(P.identity(c, Q.batch_shape))
    return jnp.concatenate([ident[None], q_l[None], tail], axis=0)


# ---------------------------------------------------------------------------
# variable-base scalar mul
# ---------------------------------------------------------------------------

def scalar_mul(Q: Point, k_limbs: jax.Array) -> Point:
    """Constant-time k*Q over the batch (4-bit fixed window, 16-entry table)."""
    c = Q.curve
    if _ladder_kernel_ok(c, Q.batch_shape):
        from . import pallas_kernels as PK

        digs = window_digits(c, k_limbs)
        bases = P.point_limbs(P.steady(Q))[None]            # [1, 3, n, B]
        out = PK.ladder_call(c, 1, digs.shape[0], Q.batch_shape[0])(
            bases, digs[:, None])
        return P.point_from_limbs(c, out)
    tbl = _point_table(Q)                       # [16, 3, n, *b]
    digs = window_digits(c, k_limbs)            # [nw, *b]

    def body(acc_l, dig):
        acc = P.point_from_limbs(c, acc_l)
        for _ in range(4):
            acc = P.steady(P.pdouble(acc))
        t = _ct_lookup(tbl, dig)
        term = P.point_from_limbs(c, t)
        acc = P.steady(P.padd(acc, term))
        return P.point_limbs(acc), None

    acc0 = _ct_lookup(tbl, digs[0])
    acc_l, _ = jax.lax.scan(body, acc0, digs[1:])
    return P.point_from_limbs(c, acc_l)


# ---------------------------------------------------------------------------
# fixed-base: precomputed comb tables for the generator
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _gen_tables_np(curve: CurveSpec):
    """T[j][d] = affine(d * 16^j * G) for j windows, d in 0..15 (host precompute;
    entry 0 is a dummy (gx,gy) masked out at lookup time). Returns
    (x_tbl, y_tbl) as uint32[nw, 16, n_limbs]."""
    f = curve.field
    nw = num_windows(curve)
    G = ec_host.aff_generator(curve)
    xs = np.zeros((nw, 16, f.n_limbs), np.uint32)
    ys = np.zeros((nw, 16, f.n_limbs), np.uint32)
    base = G
    for j in range(nw):
        acc = None
        for d in range(16):
            pt = acc if acc is not None else base  # d=0 dummy: use base point
            xs[j, d] = int_to_limbs(f.encode_int(pt[0]), f.n_limbs, f.limb_bits)
            ys[j, d] = int_to_limbs(f.encode_int(pt[1]), f.n_limbs, f.limb_bits)
            acc = ec_host.aff_add(curve, acc, base)
        base = ec_host.aff_mul(curve, 16, base)
    return xs, ys


def mul_by_generator(curve: CurveSpec, k_limbs: jax.Array) -> Point:
    """Constant-time k*G via comb tables: nw mixed adds, no doublings."""
    xs_np, ys_np = _gen_tables_np(curve)
    f = curve.field
    nw = num_windows(curve)
    bshape = k_limbs.shape[1:]
    digs = window_digits(curve, k_limbs)        # [nw(msb first), *b]
    digs = digs[::-1]                           # windows j = 0..nw-1
    if _ladder_kernel_ok(curve, bshape):
        from . import pallas_kernels as PK

        tbl = jnp.asarray(np.stack([xs_np, ys_np], axis=2))  # [nw, 16, 2, n]
        out = PK.genmul_call(curve, nw, bshape[0])(tbl, digs)
        return P.point_from_limbs(curve, out)
    xs = jnp.asarray(xs_np)                     # [nw, 16, n]
    ys = jnp.asarray(ys_np)

    def body(acc_l, xs_j):
        dig, x_t, y_t = xs_j                    # [*b], [16, n], [16, n]
        acc = P.point_from_limbs(curve, acc_l)
        expand = (16, f.n_limbs) + (1,) * len(bshape)
        x_l = _ct_lookup(x_t.reshape(expand), dig)   # [n, *b]
        y_l = _ct_lookup(y_t.reshape(expand), dig)
        xfe = F.fe_steady(f, jnp.broadcast_to(x_l, (f.n_limbs, *bshape)))
        yfe = F.fe_steady(f, jnp.broadcast_to(y_l, (f.n_limbs, *bshape)))
        acc = P.steady(P.padd_mixed(acc, xfe, yfe, q_identity=(dig == 0)))
        return P.point_limbs(acc), None

    acc0 = P.point_limbs(P.identity(curve, bshape))
    acc_l, _ = jax.lax.scan(body, acc0, (digs, xs, ys))
    return P.point_from_limbs(curve, acc_l)


# ---------------------------------------------------------------------------
# multi-scalar: shared-doubling lincomb (Straus), the verify hot path
# ---------------------------------------------------------------------------

def lincomb(terms, scalar_bits=None) -> Point:
    """sum(k_i * P_i) with shared doublings; terms = [(Point, k_limbs), ...]
    (cf. lincomb in k256/src/arithmetic/mul.rs:342-393). scalar_bits bounds
    the window count for short scalars (GLV half-scalars)."""
    c = terms[0][0].curve
    if _ladder_kernel_ok(c, terms[0][0].batch_shape, len(terms)):
        from . import pallas_kernels as PK

        digss = jnp.stack([window_digits(c, k, scalar_bits)
                           for _, k in terms], axis=1)      # [nw, T, B]
        bases = jnp.stack([P.point_limbs(P.steady(Q)) for Q, _ in terms],
                          axis=0)                           # [T, 3, n, B]
        out = PK.ladder_call(c, len(terms), digss.shape[0],
                             terms[0][0].batch_shape[0])(bases, digss)
        return P.point_from_limbs(c, out)
    tbls = [_point_table(Q) for Q, _ in terms]
    digss = jnp.stack([window_digits(c, k, scalar_bits) for _, k in terms],
                      axis=0)  # [T,nw,*b]

    def body(acc_l, digs_t):
        acc = P.point_from_limbs(c, acc_l)
        for _ in range(4):
            acc = P.steady(P.pdouble(acc))
        for t, tbl in enumerate(tbls):
            term = P.point_from_limbs(c, _ct_lookup(tbl, digs_t[t]))
            acc = P.steady(P.padd(acc, term))
        return P.point_limbs(acc), None

    digss = jnp.swapaxes(digss, 0, 1)           # [nw, T, *b]
    acc0 = P.point_limbs(P.identity(c, terms[0][0].batch_shape))
    acc_l, _ = jax.lax.scan(body, acc0, digss)
    return P.point_from_limbs(c, acc_l)


# ---------------------------------------------------------------------------
# GLV endomorphism path (secp256k1) — k256/src/arithmetic/mul.rs:129-268
# ---------------------------------------------------------------------------

def glv_decompose(curve: CurveSpec, k: int):
    """Balanced decomposition k = k1 + k2*lambda (mod n) with |ki| ~ sqrt(n).

    Host-side exact rounding (the reference's precomputed-g1/g2 rounding,
    mul.rs:129-152, is an approximation of the same lattice reduction).
    Returns (abs(k1), sign(k1), abs(k2), sign(k2)) with signs in {1, -1}.
    """
    g = curve.glv
    n = curve.n
    a1, b1, a2, b2 = g["a1"], g["b1"], g["a2"], g["b2"]
    # lattice basis: (a1, b1), (a2, b2) with a_i + b_i*lambda = 0 mod n
    c1 = (b2 * k + n // 2) // n
    c2 = (-b1 * k + n // 2) // n
    k1 = k - c1 * a1 - c2 * a2
    k2 = -c1 * b1 - c2 * b2
    assert (k1 + k2 * g["lam"]) % n == k % n
    return abs(k1), (1 if k1 >= 0 else -1), abs(k2), (1 if k2 >= 0 else -1)


def endo(Q: Point) -> Point:
    """The secp256k1 endomorphism psi(x, y) = (beta*x, y) = lambda*(x, y)
    (k256/src/arithmetic/projective.rs:287-294)."""
    c = Q.curve
    beta = F.fe_from_int(c.field, c.glv["beta"], Q.batch_shape)
    return Point(F.fmul(beta, Q.x), Q.y, Q.z, c)


def scalar_mul_glv(Q: Point, k_ints):
    """k*Q via GLV split + endomorphism dual-table lincomb: 33 window rounds
    instead of 64 (the reference's k256 mul path, mul.rs:342-393, 443-445).

    The decomposition runs host-side on the scalar values (the reference's
    decompose_scalar is likewise vartime, mul.rs:260-268); use plain
    scalar_mul for strictly data-independent handling of secret scalars.
    """
    c = Q.curve
    assert c.glv, "curve has no endomorphism"
    k1s, k2s, negs1, negs2 = [], [], [], []
    for k in k_ints:
        k1, s1, k2, s2 = glv_decompose(c, k % c.n)
        k1s.append(k1)
        k2s.append(k2)
        negs1.append(s1 < 0)
        negs2.append(s2 < 0)
    import jax.numpy as _jnp

    n1 = _jnp.asarray(np.array(negs1))
    n2 = _jnp.asarray(np.array(negs2))
    Q1 = P.pselect(n1, P.pneg(Q), Q)
    Qe = endo(Q)
    Q2 = P.pselect(n2, P.pneg(Qe), Qe)
    return lincomb([(Q1, pack_scalars(c, k1s)), (Q2, pack_scalars(c, k2s))],
                   scalar_bits=132)
