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
