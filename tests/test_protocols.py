"""Protocol tests: ECDH, Schnorr/BIP340 (official vectors), SM2-DSA,
hash2curve (RFC 9380 official vectors)."""

import random

import numpy as np
import pytest

from tpu_ecc.curves.specs import get_curve
from tpu_ecc.protocols import ecdh, schnorr, sm2, hash2curve
from tpu_ecc.utils import ec_host as H


def test_ecdh_agreement(rng):
    c = get_curve("secp256k1")
    a = ecdh.EphemeralSecret.random("secp256k1", rng)
    b = ecdh.EphemeralSecret.random("secp256k1", rng)
    s1 = a.diffie_hellman(b.public_key())
    s2 = b.diffie_hellman(a.public_key())
    assert s1.raw_secret_bytes() == s2.raw_secret_bytes()
    # oracle
    want = H.aff_mul(c, a.d * b.d % c.n, H.aff_generator(c))[0]
    assert int.from_bytes(s1.raw_secret_bytes(), "big") == want


# BIP340 official test vectors (k256/src/schnorr.rs:200-380 carries the same)
BIP340_VECTORS = [
    # (seckey, aux_rand, msg, sig) — vectors 0-2 of the BIP
    (
        "0000000000000000000000000000000000000000000000000000000000000003",
        "0000000000000000000000000000000000000000000000000000000000000000",
        "0000000000000000000000000000000000000000000000000000000000000000",
        "E907831F80848D1069A5371B402410364BDF1C5F8307B0084C55F1CE2DCA8215"
        "25F66A4A85EA8B71E482A74F382D2CE5EBEEE8FDB2172F477DF4900D310536C0",
    ),
    (
        "B7E151628AED2A6ABF7158809CF4F3C762E7160F38B4DA56A784D9045190CFEF",
        "0000000000000000000000000000000000000000000000000000000000000001",
        "243F6A8885A308D313198A2E03707344A4093822299F31D0082EFA98EC4E6C89",
        "6896BD60EEAE296DB48A229FF71DFE071BDE413E6D43F917DC8DCF8C78DE3341"
        "8906D11AC976ABCCB20B091292BFF4EA897EFCB639EA871CFA95F6DE339E4B0A",
    ),
    (
        "C90FDAA22168C234C4C6628B80DC1CD129024E088A67CC74020BBEA63B14E5C9",
        "C87AA53824B4D7AE2EB035A2B5BBBCCC080E76CDC6D1692C4B0B62D798E6D906",
        "7E2D58D8B3BCDF1ABADEC7829054F90DDA9805AAB56C77333024B9D0A508B75C",
        "5831AAEED7B44BB74E5EAB94BA9D4294C49BCF2A60728D8B4C200F50DD313C1B"
        "AB745879A5AD954A72C45A91C3A51D3C7ADEA98D82F8481E0E1E03674A6F3FB7",
    ),
]


def test_bip340_sign_vectors():
    sks = [bytes.fromhex(v[0]) for v in BIP340_VECTORS]
    auxs = [bytes.fromhex(v[1]) for v in BIP340_VECTORS]
    msgs = [bytes.fromhex(v[2]) for v in BIP340_VECTORS]
    want = [bytes.fromhex(v[3]) for v in BIP340_VECTORS]
    c = get_curve("secp256k1")
    ds = [int.from_bytes(s, "big") for s in sks]
    sigs = schnorr.sign_batch(c, ds, msgs, auxs)
    assert [s.hex() for s in sigs] == [w.hex() for w in want]


def test_bip340_verify():
    c = get_curve("secp256k1")
    G = H.aff_generator(c)
    pxs, msgs, sigs, expect = [], [], [], []
    for skh, auxh, msgh, sigh in BIP340_VECTORS:
        d = int(skh, 16)
        Pt = H.aff_mul(c, d, G)
        pxs.append(Pt[0])
        msgs.append(bytes.fromhex(msgh))
        sigs.append(bytes.fromhex(sigh))
        expect.append(True)
    # tampered signature must fail
    bad = bytearray(sigs[0])
    bad[-1] ^= 1
    pxs.append(pxs[0])
    msgs.append(msgs[0])
    sigs.append(bytes(bad))
    expect.append(False)
    assert schnorr.verify_batch(c, pxs, msgs, sigs) == expect


def test_sm2_roundtrip(rng):
    c = get_curve("sm2")
    sk = sm2.SigningKey(c, rng.randrange(1, c.n))
    vk = sk.verifying_key()
    msg = b"message digest"
    r, s = sk.sign(msg)
    assert vk.verify(msg, r, s)
    assert not vk.verify(msg + b"x", r, s)
    assert not vk.verify(msg, r, (s + 1) % c.n)


def test_sm2_gbt_vector():
    """GB/T 32918.5 appendix A example (same math as sm2/tests/sm2dsa.rs)."""
    c = get_curve("sm2")
    d = 0x3945208F7B2144B13F36E38AC6D39F95889393692860B51A42FB81EF4DF7C5B8
    sk = sm2.SigningKey(c, d, ident=b"1234567812345678")
    pub = sk.public_point()
    assert pub[0] == 0x09F9DF311E5421A150DD7D161E4BC5C672179FAD1833FC076BB08FF356F35020
    assert pub[1] == 0xCCEA490CE26775A52DC6EA718CC1AA600AED05FBF35E084A6632F6072DA9AD13
    msg = b"message digest"
    # deterministic RFC6979-SM3 k (the reference's default signing path)
    r, s = sk.sign(msg)
    assert sk.verifying_key().verify(msg, r, s)


# RFC 9380 official test vectors (J.1.1 / J.8.1)
H2C_VECTORS = {
    "p256": {
        "dst": b"QUUX-V01-CS02-with-P256_XMD:SHA-256_SSWU_RO_",
        "cases": [
            (b"", 0x2C15230B26DBC6FC9A37051158C95B79656E17A1A920B11394CA91C44247D3E4,
             0x8A7A74985CC5C776CDFE4B1F19884970453912E9D31528C060BE9AB5C43E8415),
            (b"abc", 0x0BB8B87485551AA43ED54F009230450B492FEAD5F1CC91658775DAC4A3388A0F,
             0x5C41B3D0731A27A7B14BC0BF0CCDED2D8751F83493404C84A88E71FFD424212E),
        ],
    },
    "secp256k1": {
        "dst": b"QUUX-V01-CS02-with-secp256k1_XMD:SHA-256_SSWU_RO_",
        "cases": [
            (b"", 0xC1CAE290E291AEE617EBAEF1BE6D73861479C48B841EABA9B7B5852DDFEB1346,
             0x64FA678E07AE116126F08B022A94AF6DE15985C996C3A91B64C406A960E51067),
            (b"abc", 0x3377E01EAB42DB296B512293120C6CEE72B6ECF9F9205760BD9FF11FB3CB2C4B,
             0x7F95890F33EFEBD1044D382A01B1BEE0900FB6116F94688D487C6C7B9C8371F6),
        ],
    },
}


@pytest.mark.parametrize("name", ["p256", "secp256k1"])
def test_hash_to_curve_rfc9380(name):
    c = get_curve(name)
    spec = H2C_VECTORS[name]
    msgs = [m for m, _, _ in spec["cases"]]
    got = hash2curve.hash_to_curve(c, msgs, spec["dst"])
    for (msg, wx, wy), (gx, gy) in zip(spec["cases"], got):
        assert gx == wx and gy == wy, f"{name} msg={msg!r}"


def test_expand_message_xmd():
    """RFC 9380 K.1 expand_message_xmd SHA-256 vectors."""
    dst = b"QUUX-V01-CS02-with-expander-SHA256-128"
    out = hash2curve.expand_message_xmd(b"", dst, 0x20, "sha256")
    assert out.hex() == ("68a985b87eb6b46952128911f2a4412bbc302a9d759667f8"
                        "7f7a21d803f07235")
    out = hash2curve.expand_message_xmd(b"abc", dst, 0x20, "sha256")
    assert out.hex() == ("d8ccab23b5985ccea865c6c97b6e5b8350e794e603b4b979"
                        "02f53a8a0d605615")


@pytest.mark.slow
@pytest.mark.parametrize("name", ["p384", "p521"])
def test_hash_to_curve_oncurve(name):
    """Wide-field h2c: on-curve, deterministic, message-separating."""
    c = get_curve(name)
    dst = b"QUUX-V01-CS02-test"
    pts = hash2curve.hash_to_curve(c, [b"", b"abc", b"abc"], dst)
    for x, y in pts:
        assert H.on_curve(c, (x, y))
    assert pts[1] == pts[2] and pts[0] != pts[1]
    # hash_to_scalar stays in range
    for s in hash2curve.hash_to_scalar(c, [b"x", b"y"], dst):
        assert 0 <= s < c.n
