"""ECDSA conformance: RFC 6979 vectors, sign/verify round-trips, recovery,
and the full Wycheproof suites extracted from the reference blobs
(runner semantics match k256/src/ecdsa.rs:351-425: parse strict DER, normalize
s for k256, verify)."""

import json
import os

import numpy as np
import pytest

from tpu_ecc.curves.specs import get_curve
from tpu_ecc.encoding import der
from tpu_ecc.protocols import ecdsa
from tpu_ecc.utils import ec_host as H

VEC_DIR = os.path.join(os.path.dirname(__file__), "vectors")


def test_rfc6979_p256():
    """RFC 6979 A.2.5 (P-256, SHA-256) — same vectors as p256/src/ecdsa.rs:96-110."""
    c = get_curve("p256")
    x = 0xC9AFA9D845BA75166B5C215767B1D6934E50C3DB36E89B127B8A622B120F6721
    sk = ecdsa.SigningKey(c, x)
    digest = ecdsa.hash_msg(c, b"sample")
    r, s, _ = sk.sign_prehash(digest)
    assert f"{r:064x}" == "efd48b2aacb6a8fd1140dd9cd45e81d69d2c877b56aaf991c34d0ea84eaf3716"
    assert f"{s:064x}" == "f7cb1c942d657c41d436c7a1b6e29f65f3e900dbb9aff4064dc4ab2f843acda8"
    r, s, _ = sk.sign_prehash(ecdsa.hash_msg(c, b"test"))
    assert f"{r:064x}" == "f1abb023518351cd71d881567b1ea663ed3efcf6c5132b354f28d3b0b7d38367"
    assert f"{s:064x}" == "019f4113742a2b14bd25926b49c649155f267e60d3814b4c0cc84250e46f0083"


def _run_sign_vectors(name):
    """The reference's per-crate ECDSA_TEST_VECTORS (<crate>/src/test_vectors/
    ecdsa.rs; RFC 6979-derived for k256, FIPS 186-4 SigGen for the NIST
    curves): sign_prehashed with the vector's fixed k must reproduce (r, s)
    exactly, and the vector public key must verify it."""
    c = get_curve(name)
    vecs = json.load(open(os.path.join(VEC_DIR, f"ecdsa_{name}.json")))
    ds = [int(v["d"], 16) for v in vecs]
    ks = [int(v["k"], 16) for v in vecs]
    # the vectors store m as the bits2field OUTPUT (field-width bytes; for
    # p521 that's the SHA-512 digest left-padded to 66 bytes), so interpret
    # it as an integer directly — digest_to_z's bits2int truncation is for
    # raw digests longer than qlen
    zs = [int(v["m"], 16) % c.n for v in vecs]
    pubs = [(int(v["q_x"], 16), int(v["q_y"], 16)) for v in vecs]
    want = [(int(v["r"], 16), int(v["s"], 16)) for v in vecs]
    if name not in ecdsa.SIGN_UNSUPPORTED:
        sigs = ecdsa.sign_batch(c, ds, zs, k_ints=ks, low_s=False)
        assert [(r, s) for r, s, _ in sigs] == want, f"{name}: sign mismatch"
    assert ecdsa.verify_batch(c, pubs, zs, want, low_s=False) == \
        [True] * len(vecs)


@pytest.mark.parametrize("name", ["secp256k1", "p256", "p384"])
def test_ecdsa_sign_vectors(name):
    _run_sign_vectors(name)


@pytest.mark.slow
@pytest.mark.parametrize("name", ["p192", "p224", "p521"])
def test_ecdsa_sign_vectors_slow(name):
    _run_sign_vectors(name)


def test_rfc6979_k_generation():
    """RFC 6979 A.1.1 reference k for the sample q/x (sanity of the DRBG)."""
    from tpu_ecc.protocols import rfc6979
    import hashlib

    q = 0x4000000000000000000020108A2E0CC0D99F8A5EF
    x = 0x09A4D6792295A7F730FC3F2B49CBC0F62E862272F
    h1 = hashlib.sha256(b"sample").digest()
    k = rfc6979.generate_k(q, x, h1, "sha256")
    assert k == 0x23AF4074C90A02B3FE61D286D5C87F425E6BDD81B


@pytest.mark.parametrize("name", ["secp256k1", "p256", "p384"])
def test_sign_verify_roundtrip_batch(name, rng):
    c = get_curve(name)
    B = 4
    ds = [rng.randrange(1, c.n) for _ in range(B)]
    zs = [rng.randrange(c.n) for _ in range(B)]
    sigs = ecdsa.sign_batch(c, ds, zs)
    pubs = [H.aff_mul(c, d, H.aff_generator(c)) for d in ds]
    oks = ecdsa.verify_batch(c, pubs, zs, [(r, s) for r, s, _ in sigs])
    assert oks == [True] * B
    # wrong z fails
    bad = ecdsa.verify_batch(c, pubs, [(z + 1) % c.n for z in zs],
                             [(r, s) for r, s, _ in sigs])
    assert bad == [False] * B
    # host-oracle cross-check of the signature equation
    for d, z, (r, s, _) in zip(ds, zs, sigs):
        k_check = (pow(s, -1, c.n) * (z + r * d)) % c.n
        R = H.aff_mul(c, k_check, H.aff_generator(c))
        assert R[0] % c.n == r


def test_recovery_k256(rng):
    """Batched device recovery: sign a batch, recover every key; bad recid
    and identity-x inputs return None."""
    c = get_curve("secp256k1")
    B = 4
    ds = [rng.randrange(1, c.n) for _ in range(B)]
    zs = [rng.randrange(c.n) for _ in range(B)]
    sigs = ecdsa.sign_batch(c, ds, zs)
    pubs = [H.aff_mul(c, d, H.aff_generator(c)) for d in ds]
    got = ecdsa.recover_batch(c, zs, sigs)
    assert got == pubs
    # flipped parity recovers a DIFFERENT valid key (or None), never the original
    r, s, recid = sigs[0]
    other = ecdsa.recover_public_key(c, zs[0], r, s, recid ^ 1)
    assert other != pubs[0]
    # out-of-range r rejected host-side
    assert ecdsa.recover_batch(c, [zs[0]], [(0, s, recid)]) == [None]


def test_recovery_vectors_k256():
    """The reference's signature recovery vectors (k256/src/ecdsa.rs:278-305):
    sha256 digests, 64-byte signatures, recovery IDs 0 and 1."""
    from tpu_ecc.encoding import sec1

    c = get_curve("secp256k1")
    vectors = [
        ("021a7a569e91dbf60581509c7fc946d1003b60c7dee85299538db6353538d59574",
         b"example message",
         "ce53abb3721bafc561408ce8ff99c909f7f0b18a2f788649d6470162ab1aa032"
         "3971edc523a6d6453f3fb6128d318d9db1a5ff3386feb1047d9816e780039d52", 0),
        ("036d6caac248af96f6afa7f904f550253a0f3ef3f5aa2fe6838a95b216691468e2",
         b"example message",
         "46c05b6368a44b8810d79859441d819b8e7cdc8bfd371e35c53196f4bcacdb51"
         "35c7facce2a97b95eacba8a586d87b7958aaf8368ab29cee481f76e871dbd9cb", 1),
    ]
    zs, sigs, want = [], [], []
    for pk_hex, msg, sig_hex, recid in vectors:
        sig = bytes.fromhex(sig_hex)
        r = int.from_bytes(sig[:32], "big")
        s = int.from_bytes(sig[32:], "big")
        zs.append(ecdsa.digest_to_z(c, ecdsa.hash_msg(c, msg)))
        sigs.append((r, s, recid))
        want.append(sec1.decode_point(c, bytes.fromhex(pk_hex)))
    assert ecdsa.recover_batch(c, zs, sigs) == want


def test_ethereum_end_to_end():
    """The reference's Ethereum end-to-end example (k256/src/ecdsa.rs:317-343):
    RFC6979 HMAC-DRBG-SHA-256 nonce over a Keccak256 digest, low-s signature,
    then public-key recovery round-trips."""
    from tpu_ecc.utils.keccak import keccak256

    c = get_curve("secp256k1")
    sk = ecdsa.SigningKey.from_bytes(
        "secp256k1",
        bytes.fromhex("4c0883a69102937d6231471b5dbb6204fe5129617082792ae468d01a3f362318"))
    msg = bytes.fromhex(
        "e9808504e3b29200831e848094f0109fc8df283027b6285cc889f5aa624eac1f"
        "55843b9aca0080018080")
    digest = keccak256(msg)
    r, s, recid = sk.sign_prehash(digest)
    want = bytes.fromhex(
        "c9cf86333bcb065d140032ecaab5d9281bde80f21b9687b3e94161de42d51895"
        "727a108a0b8d101465414033c3f705a9c7b826e596766046ee1183dbc8aeaa68")
    assert r.to_bytes(32, "big") + s.to_bytes(32, "big") == want
    assert recid == 0
    z = ecdsa.digest_to_z(c, digest)
    assert ecdsa.recover_public_key(c, z, r, s, recid) == sk.verifying_key().point
    assert ecdsa.verify_batch(c, [sk.verifying_key().point], [z], [(r, s)]) == [True]


def test_der_strictness():
    # round-trip
    b = der.sig_to_der(1, 2)
    assert der.der_to_sig(b) == (1, 2)
    big = (1 << 255) | 5
    assert der.der_to_sig(der.sig_to_der(big, big)) == (big, big)
    for bad in [
        b"", b"\x30", b"\x30\x00", b"\x31\x06\x02\x01\x01\x02\x01\x02",
        der.sig_to_der(1, 2) + b"\x00",                       # trailing
        b"\x30\x06\x02\x01\x01\x02\x01",                      # truncated int
        b"\x30\x08\x02\x02\x00\x01\x02\x02\x00\x02",          # non-minimal int
        b"\x30\x81\x06\x02\x01\x01\x02\x01\x02",              # non-minimal len
    ]:
        with pytest.raises(der.DerError):
            der.der_to_sig(bad)


@pytest.mark.slow
@pytest.mark.parametrize("name", ["p224", "p521", "bp256r1", "bp256t1",
                                  "bp384r1", "bp384t1"])
def test_sign_verify_all_curves(name, rng):
    """Every remaining ECDSA curve exercises the full generic machinery."""
    c = get_curve(name)
    B = 2
    ds = [rng.randrange(1, c.n) for _ in range(B)]
    zs = [rng.randrange(c.n) for _ in range(B)]
    sigs = ecdsa.sign_batch(c, ds, zs)
    pubs = [H.aff_mul(c, d, H.aff_generator(c)) for d in ds]
    assert ecdsa.verify_batch(c, pubs, zs, [(r, s) for r, s, _ in sigs]) == [True] * B
    for d, z, (r, s, _) in zip(ds, zs, sigs):
        k_check = (pow(s, -1, c.n) * (z + r * d)) % c.n
        assert H.aff_mul(c, k_check, H.aff_generator(c))[0] % c.n == r


def test_p192_verify_only(rng):
    """p192 matches the reference's verify-only policy (p192/src/ecdsa.rs:36-51)."""
    c = get_curve("p192")
    d = rng.randrange(1, c.n)
    z = rng.randrange(c.n)
    with pytest.raises(NotImplementedError):
        ecdsa.sign_batch(c, [d], [z])
    # verify still works against a host-generated signature
    k = rng.randrange(1, c.n)
    r = H.aff_mul(c, k, H.aff_generator(c))[0] % c.n
    s = (pow(k, -1, c.n) * (z + r * d)) % c.n
    pub = H.aff_mul(c, d, H.aff_generator(c))
    assert ecdsa.verify_batch(c, [pub], [z], [(r, s)]) == [True]
