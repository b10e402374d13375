"""Curve-registry sanity: parameters are consistent (host-only, no device).

Catches transcription errors in constants: primality, curve equation, group
order, Hasse bound, spec invariants. (The p521 order typo that this suite was
built to catch is exactly why the reference ships impl_primefield_tests!.)
"""

import pytest

from tpu_ecc.curves.specs import get_curve, list_curves
from tpu_ecc.utils import ec_host as H


def is_probable_prime(n: int) -> bool:
    if n < 2:
        return False
    for sp in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % sp == 0:
            return n == sp
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


@pytest.mark.parametrize("name", list_curves())
def test_params(name):
    c = get_curve(name)
    assert is_probable_prime(c.p), f"{name}: p not prime"
    assert is_probable_prime(c.n), f"{name}: n not prime"
    # generator satisfies the curve equation
    assert H.on_curve(c, (c.gx, c.gy)), f"{name}: G not on curve"
    # Hasse bound: |n - (p+1)| <= 2 sqrt(p); also the x-mod-n trick needs p < 2n
    import math
    assert abs(c.n - (c.p + 1)) <= 2 * math.isqrt(c.p) + 1
    assert c.p < 2 * c.n
    # n * G == identity (host ladder)
    assert H.aff_mul(c, c.n, (c.gx, c.gy)) is None, f"{name}: n*G != O"
    # strategy consistency
    if c.strategy == "a0":
        assert c.a == 0
    if c.strategy == "a_minus3":
        assert c.a == c.p - 3
    # field spec invariants
    for s in (c.field, c.scalar):
        assert s.mask == (1 << s.limb_bits) - 1
        assert s.mul_in_bound >= s.mask
        assert (1 << (s.limb_bits * s.n_limbs)) > s.p
        if s.kind == "mont":
            assert (s.n0 * s.p) % (1 << s.limb_bits) == (1 << s.limb_bits) - 1
        else:
            assert s.fold1_val == (1 << (s.limb_bits * s.n_limbs)) % s.p
