"""Key-codec tests: PKCS#8/SPKI/SEC1/PEM/JWK round-trips + byte-exact decode
of the reference's checked-in fixtures (p256/tests/pkcs8.rs, sm2 examples)."""

import pytest

from tpu_ecc.curves.specs import get_curve
from tpu_ecc.encoding import asn1, keys
from tpu_ecc.utils import ec_host as H

from pkcs8_fixtures import (P256_PKCS8_PRIVATE_KEY_DER, P256_PKCS8_PUBLIC_KEY_DER,
                            SM2_PKCS8_PRIVATE_KEY_DER, SM2_PKCS8_PUBLIC_KEY_DER)


def _keypair(name, d=0x1234567890ABCDEF1234):
    c = get_curve(name)
    d %= c.n
    pub = H.aff_mul(c, d, H.aff_generator(c))
    return c, d, pub


@pytest.mark.parametrize("name", ["p256", "secp256k1", "p384", "p521", "sm2"])
def test_spki_roundtrip(name):
    c, d, pub = _keypair(name)
    der = keys.spki_encode(c, pub)
    c2, pt = keys.spki_decode(der)
    assert c2 is c and pt == pub
    pem = keys.spki_to_pem(c, pub)
    assert keys.spki_from_pem(pem) == (c, pub)


@pytest.mark.parametrize("name", ["p256", "secp256k1", "p521"])
def test_pkcs8_roundtrip(name):
    c, d, pub = _keypair(name)
    der = keys.pkcs8_encode(c, d)
    c2, d2 = keys.pkcs8_decode(der)
    assert c2 is c and d2 == d
    pem = keys.pkcs8_to_pem(c, d)
    assert keys.pkcs8_from_pem(pem) == (c, d)
    # SEC1 ECPrivateKey form
    sec1_der = keys.ec_private_key_encode(c, d)
    assert keys.ec_private_key_decode(sec1_der) == (c, d)
    pem2 = keys.ec_private_key_to_pem(c, d)
    assert keys.ec_private_key_from_pem(pem2) == (c, d)


def test_reference_fixtures_decode():
    """Byte-exact interop with the reference's fixture keys."""
    c, d = keys.pkcs8_decode(P256_PKCS8_PRIVATE_KEY_DER)
    assert c.name == "p256"
    pub = H.aff_mul(c, d, H.aff_generator(c))
    c2, pt = keys.spki_decode(P256_PKCS8_PUBLIC_KEY_DER)
    assert c2.name == "p256" and pt == pub
    # and our encoder reproduces the exact public-key bytes
    assert keys.spki_encode(c, pub) == P256_PKCS8_PUBLIC_KEY_DER

    c, d = keys.pkcs8_decode(SM2_PKCS8_PRIVATE_KEY_DER)
    assert c.name == "sm2"
    pub = H.aff_mul(c, d, H.aff_generator(c))
    c2, pt = keys.spki_decode(SM2_PKCS8_PUBLIC_KEY_DER)
    assert c2.name == "sm2" and pt == pub
    assert keys.spki_encode(c, pub) == SM2_PKCS8_PUBLIC_KEY_DER


@pytest.mark.parametrize("name", ["p256", "secp256k1", "p521"])
def test_jwk_roundtrip(name):
    c, d, pub = _keypair(name)
    j = keys.jwk_encode(c, pub, d)
    c2, pt, d2 = keys.jwk_decode(j)
    assert c2 is c and pt == pub and d2 == d
    j.pop("d")
    assert keys.jwk_decode(j)[2] is None


def test_bad_inputs():
    c, d, pub = _keypair("p256")
    der = keys.spki_encode(c, pub)
    with pytest.raises(asn1.Asn1Error):
        keys.spki_decode(der + b"\x00")
    with pytest.raises(asn1.Asn1Error):
        keys.spki_decode(der[:-1])
    bad = bytearray(keys.pkcs8_encode(c, d))
    bad[4] ^= 1  # corrupt version
    with pytest.raises(asn1.Asn1Error):
        keys.pkcs8_decode(bytes(bad))