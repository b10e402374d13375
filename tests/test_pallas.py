"""Pallas kernel path tests.

The KFE kernel engine (fe_kernel.py) shares its bound ledger and formulas
with the graph path, so correctness is pinned in three layers:
1. KFE field ops vs fe.py vs host ints (fast, default).
2. The kernel-body point formulas (_KADD/_KDOUBLE on KFE) vs the host
   oracle at graph level (default; compiles the real kernel computation
   without the Mosaic wrapper).
3. The compiled Mosaic path, asserted bit-equal to the XLA path on real
   TPU by tools/bench_pallas.py and the MSM segscan equality run (PERF.md).
"""

import jax.numpy as jnp
import pytest

from tpu_ecc.curves.specs import get_curve
from tpu_ecc.ops import fe as F
from tpu_ecc.ops import fe_kernel as K
from tpu_ecc.ops import points as P
from tpu_ecc.ops import pallas_kernels as PK
from tpu_ecc.utils import ec_host as H


def _kfe_of(spec, fe: F.FE, B: int) -> K.KFE:
    return K.kfe_from_rows(
        spec, [fe.limbs[i].reshape(1, B) for i in range(spec.n_limbs)])


def _ints_of(spec, kfe: K.KFE, B: int):
    kfe = K.ksteady(kfe)
    arr = jnp.stack([r.reshape(B) for r in kfe.limbs])
    return F.fe_to_ints(F.FE(arr, spec, kfe.bound, kfe.vmax))


@pytest.mark.parametrize("name", ["secp256k1", "p256"])
def test_kfe_matches_fe(name, rng):
    """KFE field ops == fe ops == host ints (graph level, no pallas) for
    both kernel backends: solinas (secp256k1) and Montgomery CIOS (p256)."""
    c = get_curve(name)
    s = c.field
    B = 8
    av = [rng.randrange(s.p) for _ in range(B)]
    bv = [rng.randrange(s.p) for _ in range(B)]
    ka = _kfe_of(s, F.fe_from_ints(s, av), B)
    kb = _kfe_of(s, F.fe_from_ints(s, bv), B)
    ints = lambda kfe: _ints_of(s, kfe, B)  # noqa: E731

    assert ints(ka * kb) == [(x * y) % s.p for x, y in zip(av, bv)]
    assert ints(ka + kb) == [(x + y) % s.p for x, y in zip(av, bv)]
    assert ints(ka - kb) == [(x - y) % s.p for x, y in zip(av, bv)]
    assert ints(-ka) == [(-x) % s.p for x in av]
    assert ints(ka.square()) == [(x * x) % s.p for x in av]
    assert ints(K.kmul_small(ka, 21)) == [(21 * x) % s.p for x in av]
    # deep expression (exercises auto-carry points)
    deep = (ka * kb + ka.square() - kb) * ka
    want = [((x * y + x * x - y) * x) % s.p for x, y in zip(av, bv)]
    assert ints(deep) == want


@pytest.mark.parametrize("name", ["secp256k1", "p192", "p256", "bp256r1"])
def test_kernel_formulas(name, rng):
    """The kernel-body RCB formulas on KFE vs the host oracle: a0 solinas
    (secp256k1), a_minus3 solinas (p192), a_minus3 Montgomery (p256) and
    generic-a Montgomery (bp256r1) — every backend x strategy pairing."""
    c = get_curve(name)
    s = c.field
    B = 8
    ks = [rng.randrange(1, c.n) for _ in range(B)]
    pts = [H.aff_mul(c, k, H.aff_generator(c)) for k in ks]
    xs = F.fe_from_ints(s, [p_[0] for p_ in pts])
    ys = F.fe_from_ints(s, [p_[1] for p_ in pts])
    one = F.fone(s, (B,))
    A = (_kfe_of(s, xs, B), _kfe_of(s, ys, B), _kfe_of(s, one, B))
    g = P.generator(c, (B,))
    Bv = (_kfe_of(s, g.x, B), _kfe_of(s, g.y, B), _kfe_of(s, one, B))

    X3, Y3, Z3 = PK._KADD[c.strategy](c, *A, *Bv)
    zi = [pow(z, -1, c.p) for z in _ints_of(s, Z3, B)]
    gx = [(x * i) % c.p for x, i in zip(_ints_of(s, X3, B), zi)]
    gy = [(y * i) % c.p for y, i in zip(_ints_of(s, Y3, B), zi)]
    for i in range(B):
        assert (gx[i], gy[i]) == H.aff_mul(c, ks[i] + 1, H.aff_generator(c))

    X3, Y3, Z3 = PK._KDOUBLE[c.strategy](c, *A)
    zi = [pow(z, -1, c.p) for z in _ints_of(s, Z3, B)]
    gx = [(x * i) % c.p for x, i in zip(_ints_of(s, X3, B), zi)]
    gy = [(y * i) % c.p for y, i in zip(_ints_of(s, Y3, B), zi)]
    for i in range(B):
        assert (gx[i], gy[i]) == H.aff_mul(c, 2 * ks[i], H.aff_generator(c))


@pytest.mark.parametrize("name", ["secp256k1", "p192", "p256", "bp256r1"])
def test_kernel_mixed_formulas(name, rng):
    """The kernel-body RCB mixed-add formulas (_KADD_MIXED, Algs 5/8) vs the
    host oracle at graph level — the genmul_call / comb fixed-base body."""
    c = get_curve(name)
    s = c.field
    B = 8
    ks = [rng.randrange(1, c.n) for _ in range(B)]
    pts = [H.aff_mul(c, k, H.aff_generator(c)) for k in ks]
    xs = F.fe_from_ints(s, [p_[0] for p_ in pts])
    ys = F.fe_from_ints(s, [p_[1] for p_ in pts])
    one = F.fone(s, (B,))
    A = (_kfe_of(s, xs, B), _kfe_of(s, ys, B), _kfe_of(s, one, B))
    g = P.generator(c, (B,))
    gx2, gy2 = _kfe_of(s, g.x, B), _kfe_of(s, g.y, B)

    X3, Y3, Z3 = PK._KADD_MIXED[c.strategy](c, *A, gx2, gy2)
    zi = [pow(z, -1, c.p) for z in _ints_of(s, Z3, B)]
    gx = [(x * i) % c.p for x, i in zip(_ints_of(s, X3, B), zi)]
    gy = [(y * i) % c.p for y, i in zip(_ints_of(s, Y3, B), zi)]
    for i in range(B):
        assert (gx[i], gy[i]) == H.aff_mul(c, ks[i] + 1, H.aff_generator(c))


@pytest.mark.interpret
@pytest.mark.parametrize("name,B", [("secp256k1", 128), ("p256", 384)])
def test_pow_kernel_interpret(name, B, rng):
    """Compiled-path pow_call (the fused Fermat/sqrt chain kernel, default-on
    for every big fixed-exponent chain on TPU) in interpret mode, truncated
    exponent, vs the host int oracle — solinas (secp256k1) and Montgomery
    CIOS (p256) backends. e has a zero digit (the skip-mul keep branch);
    B=384 exercises the gcd lane-block router (rows=3 not divisible by the
    default 8-sublane block — ADVICE r3). Slow tier like the other
    interpret-mode kernel tests: interpreting the unrolled KFE body costs
    minutes on this 4-core host; the compiled path is gated on real TPU by
    tests/test_tpu_kernels.py::test_pow_kernel_bitequal."""
    c = get_curve(name)
    s = c.field
    e = 0x1057            # digits [1,0,5,7]: zero digit + distinct windows
    vals = [rng.randrange(s.p) for _ in range(B)]
    vals[0] = 0
    vals[1] = 1
    vals[2] = s.p - 1
    x = F.fe_from_ints(s, vals)
    out = PK.pow_call(s, e, B, interpret=True)(x.limbs)
    got = F.fe_to_ints(F.FE(out, s, s.mask, s.carried_vmax))
    assert got == [pow(v, e, s.p) for v in vals]


@pytest.mark.interpret
@pytest.mark.parametrize("name", ["secp256k1", "p256", "bp256r1"])
def test_genmul_kernel_interpret(name, rng):
    """Compiled-path genmul_call in interpret mode, truncated to 4 windows
    (16-bit scalars) so interpret stays tractable, vs the host oracle —
    exercises the SMEM table select, identity masking and VMEM accumulator
    carry across all three kernel paths: solinas a=0 (secp256k1), Montgomery
    CIOS a=-3 (p256) and generic-a (bp256r1). (The full-width kernel is
    asserted bit-equal to the XLA mul_by_generator on real TPU by
    tools/bench_genmul.py.)"""
    import numpy as np
    from tpu_ecc.ops import scalarmul as SM

    c = get_curve(name)
    B, bits = 128, 16
    ks = [rng.randrange(0, 1 << bits) for _ in range(B)]
    ks[0] = 0
    ks[1] = 16
    ks[2] = 9           # recodes to signed [-7, 1]: exercises the negation
    k_l = SM.pack_scalars(c, ks)
    mag, neg = SM.signed_digits(c, k_l, bits)
    mag, neg = mag[::-1], neg[::-1].astype(jnp.uint32)
    nw = mag.shape[0]
    xs_np, ys_np = SM._gen_tables_np(c)
    tbl = jnp.asarray(np.stack([xs_np[:nw], ys_np[:nw]], axis=2))
    out = PK.genmul_call(c, nw, B, interpret=True)(tbl, mag, neg)
    import jax
    x, y, inf = jax.jit(P.to_affine)(P.point_from_limbs(c, out))
    xi, yi = F.fe_to_ints(x), F.fe_to_ints(y)
    inf = list(map(bool, inf))
    G = H.aff_generator(c)
    for b in range(B):
        exp = H.aff_mul(c, ks[b], G)
        if exp is None:
            assert inf[b]
        else:
            assert (xi[b], yi[b]) == exp


@pytest.mark.interpret
def test_glv_ladder_kernel_interpret(rng):
    """Compiled-path ladder_call(glv=True) in interpret mode, truncated to
    short scalars, vs the host oracle: exercises the shared-table
    endomorphism select (psi post-multiply), the folded digit+half sign
    masks and the VMEM accumulator carry.
    Checks (-1)^n1 d1 Q + (-1)^n2 d2 psi(Q)."""
    import jax
    import numpy as np
    from tpu_ecc.ops import scalarmul as SM

    c = get_curve("secp256k1")
    B, bits = 128, 16
    G = H.aff_generator(c)
    pts = [H.aff_mul(c, rng.randrange(2, c.n), G) for _ in range(B)]
    Q = P.from_affine_ints(c, [p_[0] for p_ in pts], [p_[1] for p_ in pts])
    d1 = [rng.randrange(0, 1 << bits) for _ in range(B)]
    d2 = [rng.randrange(0, 1 << bits) for _ in range(B)]
    d1[0] = 0
    n1 = [rng.randrange(2) for _ in range(B)]
    n2 = [rng.randrange(2) for _ in range(B)]
    sd = [SM.signed_digits(c, SM.pack_scalars(c, d), bits) for d in (d1, d2)]
    nw = sd[0][0].shape[0]
    mags = jnp.stack([m for m, _ in sd], axis=1)            # [nw, 2, B]
    hneg = [jnp.asarray(np.asarray(nn, bool)) for nn in (n1, n2)]
    negs = jnp.stack([g != h for (_, g), h in zip(sd, hneg)],
                     axis=1).astype(jnp.uint32)
    bases = P.point_limbs(P.steady(Q))[None]                # [1, 3, n, B]
    out = PK.ladder_call(c, 1, nw, B, glv=True,
                         interpret=True)(bases, mags, negs)
    x, y, inf = jax.jit(P.to_affine)(P.point_from_limbs(c, out))
    xi, yi = F.fe_to_ints(x), F.fe_to_ints(y)
    inf = list(map(bool, inf))
    lam = c.glv["lam"]
    for b in range(B):
        k = ((-d1[b] if n1[b] else d1[b])
             + (-d2[b] if n2[b] else d2[b]) * lam) % c.n
        exp = H.aff_mul(c, k, pts[b])
        if exp is None:
            assert inf[b]
        else:
            assert (xi[b], yi[b]) == exp


# NOTE: full-width pallas_call interpret-mode tests are excluded: interpreting
# the unrolled KFE kernel takes >25 min on this 4-core host (the jaxpr is ~20x
# the graph path's). The compiled Mosaic path is instead asserted bit-equal
# to the XLA path on real TPU by tools/bench_pallas.py (padd/pdouble chains),
# tools/bench_ladder.py (scalar_mul + lincomb ladders), tools/bench_genmul.py
# (comb fixed-base) and the MSM segscan equality check (PERF.md); the kernel
# FORMULAS are covered at graph level above on every run.
