"""Scalar-mul engine tests vs reference MUL_TEST_VECTORS and the host oracle.

Covers variable-base windowed mul (primeorder projective.rs:106-150 analogue),
fixed-base comb (mul.rs:395-439 analogue) and Straus lincomb (mul.rs:342-393).
"""

import json
import os
import random

import jax
import numpy as np
import pytest

from tpu_ecc.curves.specs import get_curve
from tpu_ecc.ops import fe as F
from tpu_ecc.ops import points as P
from tpu_ecc.ops import scalarmul as SM
from tpu_ecc.utils import ec_host as H

VEC_DIR = os.path.join(os.path.dirname(__file__), "vectors")

# Cover every strategy/backend combo without paying compile for all 12 curves.
_DEFAULT = {"secp256k1", "p256", "bign256"}
CURVES = [pytest.param(n, marks=() if n in _DEFAULT else (pytest.mark.slow,))
          for n in ["secp256k1", "p256", "p384", "bp256r1", "bign256"]]


def _mul_vectors(name, limit=8):
    # bign256's shipped MUL_TEST_VECTORS are not on the curve under any byte
    # order, and the reference's own projective test imports *p256's* vectors
    # instead (bign256/tests/projective.rs:9-12) — dead data; skip them and
    # rely on the host-int oracle for bign256.
    if name == "bign256":
        return []
    path = os.path.join(VEC_DIR, f"group_{name}.json")
    if os.path.exists(path):
        vec = json.load(open(path)).get("mul", [])[:limit]
        return [(int(v["k"], 16), int(v["x"], 16), int(v["y"], 16)) for v in vec]
    return []


@pytest.mark.parametrize("name", CURVES)
def test_scalar_mul_vectors(name, rng):
    c = get_curve(name)
    vecs = _mul_vectors(name)
    G = H.aff_generator(c)
    ks = [v[0] for v in vecs] + [1, 2, rng.randrange(c.n)]
    want = [(v[1], v[2]) for v in vecs] + [
        H.aff_mul(c, k, G) for k in (1, 2)
    ] + [H.aff_mul(c, ks[-1], G)]

    g = P.generator(c, (len(ks),))
    k_l = SM.pack_scalars(c, ks)
    got = jax.jit(lambda g, k: P.to_affine(SM.scalar_mul(g, k)))(g, k_l)
    xs, ys, inf = F.fe_to_ints(got[0]), F.fe_to_ints(got[1]), np.asarray(got[2])
    assert not inf.any()
    for i, (wx, wy) in enumerate(want):
        assert xs[i] == wx and ys[i] == wy, f"{name}: k={hex(ks[i])}"


@pytest.mark.parametrize("name", CURVES)
def test_mul_by_generator(name, rng):
    c = get_curve(name)
    G = H.aff_generator(c)
    ks = [1, 2, 3, c.n - 1] + [rng.randrange(c.n) for _ in range(4)]
    want = [H.aff_mul(c, k, G) for k in ks]
    k_l = SM.pack_scalars(c, ks)
    got = jax.jit(lambda k: P.to_affine(SM.mul_by_generator(c, k)))(k_l)
    xs, ys, inf = F.fe_to_ints(got[0]), F.fe_to_ints(got[1]), np.asarray(got[2])
    assert not inf.any()
    for i, (wx, wy) in enumerate(want):
        assert xs[i] == wx and ys[i] == wy, f"{name}: k={hex(ks[i])}"


def test_scalar_mul_zero_and_order():
    c = get_curve("secp256k1")
    ks = [0, c.n - 1]
    g = P.generator(c, (2,))
    k_l = SM.pack_scalars(c, ks)
    got = jax.jit(lambda g, k: P.to_affine(SM.scalar_mul(g, k)))(g, k_l)
    inf = np.asarray(got[2])
    assert inf[0], "0*G = O"
    w = H.aff_mul(c, c.n - 1, H.aff_generator(c))
    assert F.fe_to_ints(got[0])[1] == w[0]


@pytest.mark.parametrize("name", ["secp256k1", "p256"])
def test_lincomb(name, rng):
    """u1*G + u2*Q — the ECDSA verify shape (k256 mul.rs:342-393)."""
    c = get_curve(name)
    G = H.aff_generator(c)
    q_scalar = rng.randrange(2, c.n)
    Q = H.aff_mul(c, q_scalar, G)
    u1 = [rng.randrange(c.n) for _ in range(3)]
    u2 = [rng.randrange(c.n) for _ in range(3)]
    want = [
        H.aff_add(c, H.aff_mul(c, a, G), H.aff_mul(c, b, Q))
        for a, b in zip(u1, u2)
    ]
    g = P.generator(c, (3,))
    q = P.from_affine_ints(c, [Q[0]] * 3, [Q[1]] * 3)
    u1_l = SM.pack_scalars(c, u1)
    u2_l = SM.pack_scalars(c, u2)
    got = jax.jit(
        lambda g, q, a, b: P.to_affine(SM.lincomb([(g, a), (q, b)]))
    )(g, q, u1_l, u2_l)
    xs, ys = F.fe_to_ints(got[0]), F.fe_to_ints(got[1])
    for i, w in enumerate(want):
        assert xs[i] == w[0] and ys[i] == w[1]


def test_glv_decompose_device(rng):
    """Device GLV split: sign-folded identity k = ±d1 ± d2*lambda (mod n)
    holds and both magnitudes stay under 2^GLV_BITS (the ladder's window
    budget), incl. the 0 / 1 / n-1 edges."""
    from tpu_ecc.utils.bigint import limbs_np_to_ints

    c = get_curve("secp256k1")
    ks = [0, 1, c.n - 1, c.glv["lam"], c.n - c.glv["lam"]]
    ks += [rng.randrange(c.n) for _ in range(11)]
    k_l = SM.pack_scalars(c, ks)
    d1, n1, d2, n2 = jax.jit(
        lambda k: SM.glv_decompose_device(c, k))(k_l)
    d1i = limbs_np_to_ints(np.asarray(d1), c.scalar.limb_bits)
    d2i = limbs_np_to_ints(np.asarray(d2), c.scalar.limb_bits)
    n1, n2 = np.asarray(n1), np.asarray(n2)
    for i, k in enumerate(ks):
        k1 = -d1i[i] if n1[i] else d1i[i]
        k2 = -d2i[i] if n2[i] else d2i[i]
        assert (k1 + k2 * c.glv["lam"]) % c.n == k, hex(k)
        assert max(d1i[i], d2i[i]) < (1 << SM.GLV_BITS), hex(k)
        # agrees with the host lattice decomposition's magnitudes up to
        # rounding: both satisfy the same identity with |ki| ~ sqrt(n)
        assert max(d1i[i], d2i[i]).bit_length() <= 130


def test_glv_endo():
    """psi(x, y) = (beta*x, y) equals multiplication by lambda
    (k256/src/arithmetic/projective.rs:287-294)."""
    c = get_curve("secp256k1")
    G = P.generator(c, (2,))
    x, y, inf = jax.jit(lambda g: P.to_affine(SM.endo(g)))(G)
    want = H.aff_mul(c, c.glv["lam"], H.aff_generator(c))
    assert (F.fe_to_ints(x)[0], F.fe_to_ints(y)[0]) == want
    assert not np.asarray(inf).any()


def test_scalar_mul_glv(rng):
    """Device GLV scalar-mul vs the host oracle (the reference's k256 mul
    always routes here, k256/src/arithmetic/mul.rs:443-445)."""
    c = get_curve("secp256k1")
    G = H.aff_generator(c)
    ks = [0, 1, c.n - 1] + [rng.randrange(c.n) for _ in range(5)]
    B = len(ks)
    pts = [H.aff_mul(c, rng.randrange(2, c.n), G) for _ in range(B)]
    Q = P.from_affine_ints(c, [p[0] for p in pts], [p[1] for p in pts])
    got = jax.jit(
        lambda q, k: P.to_affine(SM.scalar_mul_glv(q, k))
    )(Q, SM.pack_scalars(c, ks))
    xs, ys, inf = F.fe_to_ints(got[0]), F.fe_to_ints(got[1]), np.asarray(got[2])
    for i, k in enumerate(ks):
        want = H.aff_mul(c, k, pts[i])
        got_i = None if inf[i] else (xs[i], ys[i])
        assert got_i == want, hex(k)


def test_lincomb_glv_verify_shape(rng):
    """u1*G + u2*Q through the GLV split — the k256 ECDSA-verify hot path
    (protocols/ecdsa._verify_core routes here via lincomb_auto)."""
    c = get_curve("secp256k1")
    G = H.aff_generator(c)
    B = 4
    qs = [rng.randrange(2, c.n) for _ in range(B)]
    pts = [H.aff_mul(c, q, G) for q in qs]
    u1 = [rng.randrange(c.n) for _ in range(B)]
    u2 = [rng.randrange(c.n) for _ in range(B)]
    g = P.generator(c, (B,))
    q = P.from_affine_ints(c, [p[0] for p in pts], [p[1] for p in pts])
    got = jax.jit(
        lambda g, q, a, b: P.to_affine(SM.lincomb_glv([(g, a), (q, b)]))
    )(g, q, SM.pack_scalars(c, u1), SM.pack_scalars(c, u2))
    xs, ys = F.fe_to_ints(got[0]), F.fe_to_ints(got[1])
    for i in range(B):
        want = H.aff_add(c, H.aff_mul(c, u1[i], G), H.aff_mul(c, u2[i], pts[i]))
        assert (xs[i], ys[i]) == want


def test_derive_public_ct(rng):
    """Constant-time public-key derivation d -> dG (the device comb) vs the
    host oracle — the reference's ct SecretKey::public_key
    (k256/src/arithmetic/mul.rs:424-439). Every key API routes secrets
    through here, never the vartime host ladder (DESIGN.md ct policy)."""
    for name in ("secp256k1", "p256", "p521", "sm2"):
        c = get_curve(name)
        ds = [1, 2, c.n - 1] + [rng.randrange(1, c.n) for _ in range(5)]
        got = SM.derive_public_batch(c, ds)
        want = [H.aff_mul(c, d, H.aff_generator(c)) for d in ds]
        assert got == want, name


def test_key_apis_use_device_comb():
    """The protocol key APIs must not hand secret scalars to the vartime
    host ladder (VERDICT r4 item 1): spot-check each API derives the same
    public key the ct comb does, and that no protocol module references
    ec_host.aff_mul anymore."""
    import inspect
    from tpu_ecc.protocols import ecdsa, schnorr, sm2, bign, ecdh
    from tpu_ecc.encoding import keys as EK

    for mod in (ecdsa, schnorr, sm2, bign, ecdh, EK):
        src = inspect.getsource(mod)
        assert "aff_mul" not in src, mod.__name__

    c = get_curve("secp256k1")
    d = 0xC9AFA9D845BA75166B5C215767B1D6934E50C3DB36E89B127B8A622B120F6721
    want = SM.derive_public(c, d)
    assert ecdsa.SigningKey(c, d).verifying_key().point == want
    assert schnorr.SigningKey(c, d).verifying_key().x == want[0]
    assert ecdh.EphemeralSecret(c, d).public_key() == want
