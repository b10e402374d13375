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


def signed_digits(curve: CurveSpec, k_limbs: jax.Array, scalar_bits=None):
    """4-bit windows recoded to signed digits in [-8, 8] — the reference's
    Radix16Decomposition (k256/src/arithmetic/mul.rs:274-305). Returns
    (mag, neg): uint32[nw+1, *batch] magnitudes in [0, 8] and sign masks,
    MSB window first (the extra top window absorbs the final carry).

    Halves the ct table (9 entries [O..8Q] vs 16) at the cost of one
    conditional y negation per selected term. The borrow chain is unrolled
    in Python (static window count): a lax.scan of ~65 tiny steps costs
    more in while-loop overhead than the whole recode."""
    digs = window_digits(curve, k_limbs, scalar_bits)[::-1]   # LSB first

    carry = jnp.zeros_like(digs[0])
    mags, negs = [], []
    for j in range(digs.shape[0]):
        e = digs[j] + carry
        hi = e > 8
        mags.append(jnp.where(hi, np.uint32(16) - e, e))
        negs.append(hi)
        carry = hi.astype(U32)
    mag = jnp.stack(mags + [carry], axis=0)
    neg = jnp.stack(negs + [jnp.zeros_like(negs[0])], axis=0)
    return mag[::-1], neg[::-1]                               # MSB first


def _coord_steady(f, fe):
    """One coordinate's steady clamp (the per-FE body of points.steady —
    mirrors fe_kernel.ksteady so graph and kernel ladders stay bit-equal)."""
    if f.kind == "mont":
        v = F.freduce(fe, 4)
        return F.FE(v.limbs, f, f.mask, f.carried_vmax)
    return F._steady(fe)


def _signed_term(curve: CurveSpec, tbl9: jax.Array, mag, neg):
    """Constant-time signed-table term: select |d| from the 9-entry table
    and conditionally negate y (the XLA twin of the kernel's select+negate;
    bit-matched op order). tbl9 [9, 3, n, *b] -> limbs [3, n, *b]."""
    f = curve.field
    t = _ct_lookup(tbl9, mag)                     # [3, n, *b]
    y = F.FE(t[1], f, f.mask, f.carried_vmax)
    yn = _coord_steady(f, F.fneg(y))
    y_sel = jnp.where(neg, yn.limbs, t[1])
    return jnp.stack([t[0], y_sel, t[2]], axis=0)


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

    return (len(batch_shape) == 1 and batch_shape[0] % 128 == 0
            and PK._supported(curve)
            and PK.ladder_fits(curve, terms, batch_shape[0]))


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

def scalar_mul(Q: Point, k_limbs: jax.Array, scalar_bits=None) -> Point:
    """Constant-time k*Q over the batch: signed 4-bit fixed windows with a
    9-entry table [O..8Q] (cf. the reference's LookupTable + Radix16,
    k256/src/arithmetic/mul.rs:94-126, 274-305).

    Full-width scalars on an endomorphism curve route through the GLV split
    (34 window rounds instead of 65 — the reference's k256 mul always does,
    mul.rs:443-445; the split is branchless, so secret scalars are safe)."""
    import os

    c = Q.curve
    if (c.glv and scalar_bits is None
            and os.environ.get("TPU_ECC_GLV", "1") != "0"):
        return scalar_mul_glv(Q, k_limbs)
    mag, neg = signed_digits(c, k_limbs, scalar_bits)
    if _ladder_kernel_ok(c, Q.batch_shape):
        from . import pallas_kernels as PK

        bases = P.point_limbs(P.steady(Q))[None]            # [1, 3, n, B]
        out = PK.ladder_call(c, 1, mag.shape[0], Q.batch_shape[0])(
            bases, mag[:, None], neg[:, None].astype(U32))
        return P.point_from_limbs(c, out)
    tbl = _point_table(Q, size=9)               # [9, 3, n, *b]

    def body(acc_l, mn):
        m, g = mn
        acc = P.point_from_limbs(c, acc_l)
        for _ in range(4):
            acc = P.steady(P.pdouble(acc))
        term = P.point_from_limbs(c, _signed_term(c, tbl, m, g))
        acc = P.steady(P.padd(acc, term))
        return P.point_limbs(acc), None

    acc0 = _signed_term(c, tbl, mag[0], neg[0])
    acc_l, _ = jax.lax.scan(body, acc0, (mag[1:], neg[1:]))
    return P.point_from_limbs(c, acc_l)


# ---------------------------------------------------------------------------
# fixed-base: precomputed comb tables for the generator
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _gen_tables_np(curve: CurveSpec):
    """T[j][d] = affine(d * 16^j * G) for nw+1 signed windows, d in 0..8
    (host precompute; entry 0 is a dummy (gx,gy) masked out at lookup time;
    the extra window absorbs the signed-recode carry). Returns
    (x_tbl, y_tbl) as uint32[nw+1, 9, n_limbs]."""
    f = curve.field
    nw = num_windows(curve) + 1
    G = ec_host.aff_generator(curve)
    xs = np.zeros((nw, 9, f.n_limbs), np.uint32)
    ys = np.zeros((nw, 9, f.n_limbs), np.uint32)
    base = G
    for j in range(nw):
        acc = None
        for d in range(9):
            pt = acc if acc is not None else base  # d=0 dummy: use base point
            xs[j, d] = int_to_limbs(f.encode_int(pt[0]), f.n_limbs, f.limb_bits)
            ys[j, d] = int_to_limbs(f.encode_int(pt[1]), f.n_limbs, f.limb_bits)
            acc = ec_host.aff_add(curve, acc, base)
        base = ec_host.aff_mul(curve, 16, base)
    return xs, ys


def mul_by_generator(curve: CurveSpec, k_limbs: jax.Array) -> Point:
    """Constant-time k*G via signed comb tables (9 entries per window):
    nw+1 mixed adds, no doublings, with a conditional y negation per
    window (Radix16 signed digits, cf. k256/src/arithmetic/mul.rs:395-439)."""
    xs_np, ys_np = _gen_tables_np(curve)
    f = curve.field
    bshape = k_limbs.shape[1:]
    mag, neg = signed_digits(curve, k_limbs)    # [nw+1 (msb first), *b]
    mag, neg = mag[::-1], neg[::-1]             # windows j = 0..nw
    nw = mag.shape[0]
    if _ladder_kernel_ok(curve, bshape):
        from . import pallas_kernels as PK

        tbl = jnp.asarray(np.stack([xs_np, ys_np], axis=2))  # [nw, 9, 2, n]
        out = PK.genmul_call(curve, nw, bshape[0])(tbl, mag, neg.astype(U32))
        return P.point_from_limbs(curve, out)
    xs = jnp.asarray(xs_np)                     # [nw, 9, n]
    ys = jnp.asarray(ys_np)

    def body(acc_l, xs_j):
        m, g, x_t, y_t = xs_j                   # [*b], [*b], [9, n], [9, n]
        acc = P.point_from_limbs(curve, acc_l)
        expand = (9, f.n_limbs) + (1,) * len(bshape)
        x_l = _ct_lookup(x_t.reshape(expand), m)     # [n, *b]
        y_l = _ct_lookup(y_t.reshape(expand), m)
        xfe = F.fe_steady(f, jnp.broadcast_to(x_l, (f.n_limbs, *bshape)))
        yfe = F.fe_steady(f, jnp.broadcast_to(y_l, (f.n_limbs, *bshape)))
        yn = _coord_steady(f, F.fneg(yfe))
        yfe = F.fselect(g, yn, yfe)
        acc = P.steady(P.padd_mixed(acc, xfe, yfe, q_identity=(m == 0)))
        return P.point_limbs(acc), None

    acc0 = P.point_limbs(P.identity(curve, bshape))
    acc_l, _ = jax.lax.scan(body, acc0, (mag, neg, xs, ys))
    return P.point_from_limbs(curve, acc_l)


# ---------------------------------------------------------------------------
# constant-time public-key derivation (SecretKey::public_key analogue)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _derive_public_core(curve: CurveSpec):
    @jax.jit
    def core(d_raw):
        Pt = mul_by_generator(curve, d_raw)
        x, y, _ = P.to_affine(Pt)
        # one packed output = one D2H fetch
        return jnp.concatenate([F.fe_to_words(x), F.fe_to_words(y)], axis=0)

    return core


def derive_public_batch(curve: CurveSpec, d_ints) -> list:
    """Constant-time public keys [(x, y)] = [d*G] for secret scalars d.

    The ONLY sanctioned path from a secret scalar to its public point: the
    device comb (`mul_by_generator`, masked one-hot selects, no
    secret-dependent control flow) — matching the reference's ct
    `SecretKey::public_key` (k256/src/arithmetic/mul.rs:424-439, ct
    discipline per primeorder/src/projective.rs:106-150). The host
    double-and-add (`ec_host.aff_mul`) branches per secret bit and must
    never see a secret operand (DESIGN.md "constant-time policy")."""
    packed = np.asarray(jax.device_get(
        _derive_public_core(curve)(pack_scalars(curve, d_ints))))
    nwf = (curve.field.bits + 31) // 32
    xs = F.ints_from_words(packed[:nwf])
    ys = F.ints_from_words(packed[nwf:])
    return list(zip(xs, ys))


def derive_public(curve: CurveSpec, d: int) -> tuple:
    """Single-key ct public-key derivation (batch-1 device comb)."""
    return derive_public_batch(curve, [d])[0]


# ---------------------------------------------------------------------------
# multi-scalar: shared-doubling lincomb (Straus), the verify hot path
# ---------------------------------------------------------------------------

def lincomb(terms, scalar_bits=None) -> Point:
    """sum(k_i * P_i) with shared doublings and signed windows; terms =
    [(Point, k_limbs), ...] (cf. lincomb in k256/src/arithmetic/mul.rs:
    342-393). scalar_bits bounds the window count for short scalars."""
    c = terms[0][0].curve
    sd = [signed_digits(c, k, scalar_bits) for _, k in terms]
    if _ladder_kernel_ok(c, terms[0][0].batch_shape, len(terms)):
        from . import pallas_kernels as PK

        mags = jnp.stack([m for m, _ in sd], axis=1)        # [nw, T, B]
        negs = jnp.stack([g for _, g in sd], axis=1).astype(U32)
        bases = jnp.stack([P.point_limbs(P.steady(Q)) for Q, _ in terms],
                          axis=0)                           # [T, 3, n, B]
        out = PK.ladder_call(c, len(terms), mags.shape[0],
                             terms[0][0].batch_shape[0])(bases, mags, negs)
        return P.point_from_limbs(c, out)
    tbls = [_point_table(Q, size=9) for Q, _ in terms]
    mags = jnp.stack([m for m, _ in sd], axis=0)            # [T, nw, *b]
    negs = jnp.stack([g for _, g in sd], axis=0)

    def body(acc_l, mn):
        mag_t, neg_t = mn
        acc = P.point_from_limbs(c, acc_l)
        for _ in range(4):
            acc = P.steady(P.pdouble(acc))
        for t, tbl in enumerate(tbls):
            term = P.point_from_limbs(c, _signed_term(c, tbl, mag_t[t],
                                                      neg_t[t]))
            acc = P.steady(P.padd(acc, term))
        return P.point_limbs(acc), None

    mags = jnp.swapaxes(mags, 0, 1)             # [nw, T, *b]
    negs = jnp.swapaxes(negs, 0, 1)
    acc0 = P.point_limbs(P.identity(c, terms[0][0].batch_shape))
    acc_l, _ = jax.lax.scan(body, acc0, (mags, negs))
    return P.point_from_limbs(c, acc_l)


# ---------------------------------------------------------------------------
# GLV endomorphism path (secp256k1) — k256/src/arithmetic/mul.rs:129-268
# ---------------------------------------------------------------------------

GLV_BITS = 132  # |k1|,|k2| < 2^130 (lattice bound + rounding slack); the
# reference's half-scalar ladders likewise run 132-bit windows
# (k256/src/arithmetic/mul.rs:342-393).


@functools.lru_cache(maxsize=None)
def _glv_consts(curve: CurveSpec):
    """Precomputed rounding multipliers g_i = round(2^shift * b_i' / n) for
    the device decomposition (the reference precomputes G1/G2 the same way,
    k256/src/arithmetic/mul.rs:129-152). shift is a multiple of the limb
    width so the mul-shift drops whole limbs."""
    g = curve.glv
    s = curve.scalar
    n = curve.n
    shift_l = -(-(n.bit_length() + GLV_BITS + 2) // s.limb_bits)
    shift = s.limb_bits * shift_l
    g1 = ((g["b2"] << shift) + n // 2) // n
    g2 = (((-g["b1"]) << shift) + n // 2) // n
    out_l = -(-(GLV_BITS + 2) // s.limb_bits)
    return shift_l, out_l, g1, g2


def glv_decompose_device(curve: CurveSpec, u_raw: jax.Array):
    """Batched on-device GLV split of canonical scalar limbs u [ns, *b] into
    signed halves: returns (d1, neg1, d2, neg2) with d_i canonical limb
    arrays of |k_i| < 2^GLV_BITS and neg_i bool masks such that
    u = (-1)^neg1 * d1 + (-1)^neg2 * d2 * lambda (mod n).

    Fully branchless (constant-time by construction) device analogue of the
    reference's decompose_scalar (k256/src/arithmetic/mul.rs:260-268):
    c_i = floor(u * g_i / 2^shift), k2 = -(c1 b1 + c2 b2) mod n,
    k1 = u - k2 lambda mod n, then a high-half sign fold per element.
    """
    g = curve.glv
    s = curve.scalar
    n = curve.n
    bshape = u_raw.shape[1:]
    shift_l, out_l, g1, g2 = _glv_consts(curve)
    with F.unrolled():
        return _glv_decompose_traced(curve, u_raw, g, s, n, bshape,
                                     shift_l, out_l, g1, g2)


def _glv_decompose_traced(curve, u_raw, g, s, n, bshape, shift_l, out_l,
                          g1, g2):

    def to_mont(raw, vmax):
        fe = F.FE(raw, s, s.mask, vmax)
        return F.fmul(fe, F.fe_from_int(s, s.r, bshape))

    def wide(gi):
        c = F.fmul_shift(s, u_raw, gi, shift_l, out_l)
        c = jnp.concatenate(
            [c, jnp.zeros((s.n_limbs - out_l, *bshape), U32)], axis=0)
        return to_mont(c, (1 << (s.limb_bits * out_l)) - 1)

    c1_m, c2_m = wide(g1), wide(g2)
    mb1 = F.fe_from_int(s, (-g["b1"]) % n, bshape)
    mb2 = F.fe_from_int(s, (-g["b2"]) % n, bshape)
    lam = F.fe_from_int(s, g["lam"], bshape)
    k2_m = F.fmul(c1_m, mb1) + F.fmul(c2_m, mb2)
    u_m = to_mont(u_raw, n - 1)
    k1_m = u_m - F.fmul(k2_m, lam)

    from ..utils.bigint import int_to_limbs
    half = int_to_limbs(n // 2 + 1, s.n_limbs, s.limb_bits)

    def sign_fold(k_m):
        raw = F.fto_raw_canonical(k_m)
        _, high = F._cond_sub(s, raw, half)          # value > n/2 => negative
        fe = F.FE(raw, s, s.mask, n - 1)
        mag = F.fselect(high, F.fcanonical(F.fneg(fe)), fe)
        return mag.limbs, high

    d1, neg1 = sign_fold(k1_m)
    d2, neg2 = sign_fold(k2_m)
    return d1, neg1, d2, neg2


def _glv_kernel_ok(curve: CurveSpec, batch_shape, terms: int) -> bool:
    """The GLV ladder kernel shares each base's 16-entry table between its
    plain and endo halves, so the VMEM budget is that of a `terms`-table
    ladder (not 2*terms)."""
    import os

    if os.environ.get("TPU_ECC_KERNELS", "1") == "0":
        return False
    if jax.default_backend() != "tpu":
        return False
    from . import pallas_kernels as PK

    return (len(batch_shape) == 1 and batch_shape[0] % 128 == 0
            and PK._supported(curve)
            and PK.ladder_fits(curve, terms, batch_shape[0]))


def lincomb_glv(terms) -> Point:
    """sum(k_i * P_i) through the curve's endomorphism: each full-width
    scalar splits on device into two signed 132-bit halves, halving the
    shared-doubling window count (the reference's k256 verify always routes
    through this, k256/src/arithmetic/mul.rs:342-393, 443-445).

    terms = [(Point, k_raw_limbs), ...]. Safe for secret scalars too: the
    device decomposition is branchless, unlike the reference's vartime one.
    """
    c = terms[0][0].curve
    assert c.glv, "curve has no endomorphism"
    bshape = terms[0][0].batch_shape
    halves = []                      # (point idx, endo?, digits, neg mask)
    for Q, u in terms:
        d1, n1, d2, n2 = glv_decompose_device(c, u)
        halves.append((Q, False, d1, n1))
        halves.append((Q, True, d2, n2))
    if _glv_kernel_ok(c, bshape, len(terms)):
        from . import pallas_kernels as PK

        # signed window digits per half; the half's sign folds into each
        # window's sign mask (negating a scalar negates every signed digit)
        sd = [signed_digits(c, d, GLV_BITS) for _, _, d, _ in halves]
        mags = jnp.stack([m for m, _ in sd], axis=1)           # [nw, 2T, B]
        negs = jnp.stack(
            [g != hneg for (_, g), (*_, hneg) in zip(sd, halves)],
            axis=1).astype(U32)
        bases = jnp.stack([P.point_limbs(P.steady(Q)) for Q, _ in terms],
                          axis=0)                              # [T, 3, n, B]
        out = PK.ladder_call(c, len(terms), mags.shape[0], bshape[0],
                             glv=True)(bases, mags, negs)
        return P.point_from_limbs(c, out)
    pts = []
    for Q, endo_f, d, neg in halves:
        Pt = endo(Q) if endo_f else Q
        Pt = P.pselect(neg, P.pneg(Pt), Pt)
        pts.append((Pt, d))
    return lincomb(pts, scalar_bits=GLV_BITS)


def lincomb_auto(terms, scalar_bits=None) -> Point:
    """lincomb, routed through the GLV split when the curve has an
    endomorphism and the scalars are full-width (the protocol hot paths)."""
    c = terms[0][0].curve
    import os

    if (c.glv and scalar_bits is None
            and os.environ.get("TPU_ECC_GLV", "1") != "0"):
        return lincomb_glv(terms)
    return lincomb(terms, scalar_bits)


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


def scalar_mul_glv(Q: Point, k_limbs: jax.Array) -> Point:
    """k*Q via the device GLV split + endomorphism dual lincomb: 33 window
    rounds instead of 64 (the reference's k256 mul path, mul.rs:342-393,
    443-445). Constant-time: the split is branchless (glv_decompose_device)
    and the ladder is the ct windowed lincomb."""
    return lincomb_glv([(Q, k_limbs)])
