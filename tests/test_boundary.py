"""Host boundary types + serde wire formats (NonZeroScalar / serdect parity,
cf. elliptic-curve NonZeroScalar, k256 Scalar::invert_vartime, serdect)."""

import pytest

from tpu_ecc.curves.scalars import NonZeroScalar, invert_vartime
from tpu_ecc.curves.specs import get_curve
from tpu_ecc.encoding import serde
from tpu_ecc.utils import ec_host as H


def test_nonzero_scalar_validation():
    c = get_curve("secp256k1")
    with pytest.raises(ValueError):
        NonZeroScalar(c, 0)
    with pytest.raises(ValueError):
        NonZeroScalar(c, c.n)
    s = NonZeroScalar(c, 5)
    assert int(s) == 5
    assert len(s.to_bytes()) == 32
    assert NonZeroScalar.from_bytes("secp256k1", s.to_bytes()) == s
    with pytest.raises(ValueError):
        NonZeroScalar.from_bytes("secp256k1", b"\x00" * 32)


def test_nonzero_scalar_arith(rng):
    c = get_curve("secp256k1")
    s = NonZeroScalar.random("secp256k1", rng)
    inv = s.invert_vartime()
    assert (int(s) * int(inv)) % c.n == 1
    assert int(s * inv) == 1
    assert (int(s) + int(s.negate())) % c.n == 0
    # multiplying to zero is rejected (n is prime so only via 0, but the
    # boundary type enforces it structurally)
    assert invert_vartime(int(s), c.n) == pow(int(s), -1, c.n)
    with pytest.raises(ValueError):
        invert_vartime(0, c.n)


@pytest.mark.parametrize("name", ["secp256k1", "p384"])
def test_serde_scalar_field(name, rng):
    c = get_curve(name)
    k = rng.randrange(1, c.n)
    hexs = serde.scalar_to_wire(c, k)
    assert hexs == hexs.lower() and len(hexs) == 2 * c.scalar_bytes
    assert serde.scalar_from_wire(c, hexs) == k
    assert serde.scalar_from_wire(c, hexs.upper()) == k          # case-insensitive
    raw = serde.scalar_to_wire(c, k, human=False)
    assert serde.scalar_from_wire(c, raw, human=False) == k
    with pytest.raises(serde.SerdeError):
        serde.scalar_from_wire(c, "zz" * c.scalar_bytes)
    with pytest.raises(serde.SerdeError):
        serde.scalar_from_wire(c, serde.scalar_to_wire(c, 1)[2:])  # short
    with pytest.raises(serde.SerdeError):
        serde.scalar_from_wire(c, f"{c.n:0{2*c.scalar_bytes}x}")   # unreduced
    x = rng.randrange(c.p)
    assert serde.field_from_wire(c, serde.field_to_wire(c, x)) == x


def test_serde_point(rng):
    c = get_curve("secp256k1")
    Q = H.aff_mul(c, rng.randrange(1, c.n), H.aff_generator(c))
    w = serde.point_to_wire(c, Q)
    assert len(w) == 2 * 33 and w[:2] in ("02", "03")
    assert serde.point_from_wire(c, w) == Q
    wu = serde.point_to_wire(c, Q, compress=False, human=False)
    assert wu[0] == 4 and serde.point_from_wire(c, wu, human=False) == Q
    assert serde.point_from_wire(c, serde.point_to_wire(c, None)) is None
