"""Field-layer tests: every backend op vs the Python-int oracle.

This is the TPU build's version of the reference's proptest-vs-BigUint fuzzing
(k256/src/arithmetic/field.rs:771-872, k256/src/arithmetic/dev.rs:7-23).

All device math is jitted as whole expressions (eager per-op dispatch is
pathological on this backend); packing/unpacking happens host-side.
"""

import random

import jax
import numpy as np
import pytest

from tpu_ecc.curves.specs import get_curve, list_curves
from tpu_ecc.ops import fe as F

# Representative specs cover every backend flavor (solinas-13 narrow/wide,
# mont-13 narrow/tight, mont-12 wide); the full 24-spec matrix runs with
# `-m slow` (this box compiles slowly; coverage is per code path, not per curve).
_DEFAULT = {"secp256k1.fp", "secp256k1.fn", "p256.fp", "p256.fn", "p384.fp",
            "p521.fp", "p521.fn", "bign256.fp", "p192.fp"}
ALL_FIELDS = []
for _c in list_curves():
    cur = get_curve(_c)
    for spec, suffix in ((cur.field, "fp"), (cur.scalar, "fn")):
        _id = f"{_c}.{suffix}"
        marks = () if _id in _DEFAULT else (pytest.mark.slow,)
        ALL_FIELDS.append(pytest.param(spec, id=_id, marks=marks))


def ev(spec, fn, *int_lists):
    """Pack int batches, run fn jitted, return canonical ints (or raw arrays)."""
    xs = [F.fe_from_ints(spec, v) for v in int_lists]
    out = jax.jit(lambda *fes: _canon(fn(*fes)))(*xs)
    return _unpack(out)


def _canon(t):
    if isinstance(t, F.FE):
        return F.fcanonical(t)
    if isinstance(t, tuple):
        return tuple(_canon(u) for u in t)
    return t


def _unpack(t):
    if isinstance(t, F.FE):
        return F.fe_to_ints(t)
    if isinstance(t, tuple):
        return tuple(_unpack(u) for u in t)
    return np.asarray(t)


def rand_elems(rng, spec, k):
    p = spec.p
    special = [0, 1, 2, p - 1, p - 2, p // 2, (1 << (spec.bits - 1)) % p]
    vals = special + [rng.randrange(p) for _ in range(k - len(special))]
    return vals[:k]


@pytest.mark.parametrize("spec", ALL_FIELDS)
def test_roundtrip(spec, rng):
    vals = rand_elems(rng, spec, 16)
    x = F.fe_from_ints(spec, vals)
    assert F.fe_to_ints(x) == [v % spec.p for v in vals]


@pytest.mark.parametrize("spec", ALL_FIELDS)
def test_arith_vs_oracle(spec, rng):
    """add/sub/neg/mul/square/small-mul + lazy chains, one jitted expression."""
    p = spec.p
    k = 12
    a_v = rand_elems(rng, spec, k)
    b_v = list(reversed(rand_elems(rng, spec, k)))

    def fn(a, b):
        return (
            a + b,
            a - b,
            -a,
            a * b,
            a.square(),
            (a + b) * (a - b),          # lazy inputs to mul
            a * 21,
            (a + b) + ((a - b) + (a + a)),   # long lazy chain
        )

    got = ev(spec, fn, a_v, b_v)
    want = (
        [(x + y) % p for x, y in zip(a_v, b_v)],
        [(x - y) % p for x, y in zip(a_v, b_v)],
        [(-x) % p for x in a_v],
        [(x * y) % p for x, y in zip(a_v, b_v)],
        [(x * x) % p for x in a_v],
        [((x + y) * (x - y)) % p for x, y in zip(a_v, b_v)],
        [(21 * x) % p for x in a_v],
        [(4 * x) % p for x, y in zip(a_v, b_v)],
    )
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"op {i} mismatch"


@pytest.mark.parametrize("spec", ALL_FIELDS)
def test_mul_associativity(spec, rng):
    p = spec.p
    k = 8
    a_v = [rng.randrange(p) for _ in range(k)]
    b_v = [rng.randrange(p) for _ in range(k)]
    c_v = [rng.randrange(p) for _ in range(k)]
    got = ev(spec, lambda a, b, c: ((a * b) * c, a * (b * c)), a_v, b_v, c_v)
    want = [(x * y * z) % p for x, y, z in zip(a_v, b_v, c_v)]
    assert got[0] == want and got[1] == want


@pytest.mark.parametrize("spec", ALL_FIELDS)
def test_invert(spec, rng):
    p = spec.p
    vals = [1, 2, p - 1] + [rng.randrange(1, p) for _ in range(4)] + [0]
    got = ev(spec, F.finv, vals)
    assert got == [pow(v, -1, p) if v else 0 for v in vals]


@pytest.mark.parametrize("spec", ALL_FIELDS)
def test_eq_zero_select(spec):
    p = spec.p
    a_v = [5, 0, p - 1, 7]
    b_v = [5, 1, p - 1, 8]

    def fn(a, b):
        e = F.feq(a, b)
        return e, F.fis_zero(a), F.fselect(e, a, b)

    e, z, sel = ev(spec, fn, a_v, b_v)
    assert list(e) == [True, False, True, False]
    assert list(z) == [False, True, False, False]
    assert sel == [5, 1, p - 1, 8]


SQRT_FIELDS = [
    pytest.param(get_curve(c).field, id=f"{c}.fp")
    for c in ("secp256k1", "p192", "p224", "p256", "p384", "p521", "sm2")
]


@pytest.mark.parametrize("spec", SQRT_FIELDS)
def test_sqrt(spec, rng):
    p = spec.p
    squares = [pow(rng.randrange(1, p), 2, p) for _ in range(6)] + [0, 1]
    nr = 3
    while pow(nr, (p - 1) // 2, p) != p - 1:
        nr += 1
    vals = squares + [nr]
    r, ok = ev(spec, F.fsqrt, vals)
    assert list(ok) == [True] * len(squares) + [False]
    for g, v in zip(r[: len(squares)], squares):
        assert (g * g) % p == v


DBL_CURVES = ["secp256k1", "p256", "bign256"]


@pytest.mark.parametrize("name", DBL_CURVES)
def test_field_dbl_vectors(name):
    """The reference's field doubling-chain vectors
    (<curve>/src/test_vectors/field.rs DBL_TEST_VECTORS)."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "vectors",
                        f"field_dbl_{name}.json")
    if not os.path.exists(path):
        pytest.skip("no vectors shipped for this curve")
    vals = [int(h, 16) for h in json.load(open(path))]
    spec = get_curve(name).field
    x = F.fe_from_ints(spec, vals[:-1])
    got = jax.jit(lambda v: F.fcanonical(v + v))(x)
    assert F.fe_to_ints(got) == vals[1:]
