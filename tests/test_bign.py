"""bign-DSA (STB 34.101.45) + belt-hash (STB 34.101.31) conformance."""

import pytest

from tpu_ecc.protocols import belt, bign
from tpu_ecc.curves.specs import get_curve

# reference vector from bign256/tests/dsa.rs:16-25
PUB = bytes.fromhex(
    "04"
    "D07F8590A8F77BF84F1EF10C6DE44CF5DDD52B4C9DE4CE3FE0799D1750561ABD"
    "909AD9B92A4DB89A4A050959DA2E0C1926281B466D68913417C8E86103A6C67A")
SIG = bytes.fromhex(
    "63F59C523FF1780851143114FFBC5C13"
    "9BE81FF88F9D7F7FE209A6914198044C2A41D37B8439AAB42983FDB04AC2C326")


def test_belt_block_vector():
    """STB 34.101.31 A.1 block-cipher vector (also self-checked at import)."""
    assert belt.BLOCK_SELFTEST_OK
    x = bytes.fromhex("b194bac80a08f53b366d008e584a5de4")
    k = bytes.fromhex("e9dee72c8f0c0fa62ddb49f46f739647"
                      "06075316ed247a3739cba38303a98bf6")
    assert belt.belt_block_encrypt(x, k).hex() == \
        "69cca1c93557c9e3d66bc3e0fa88fa6e"


def test_belt_hash_regression():
    """Digest of the standard's 32-byte test string (STB 34.101.31 A.7)."""
    x = bytes.fromhex("b194bac80a08f53b366d008e584a5de4"
                      "8504fa9d1bb6c7ac252e72c202fdce0d")
    assert belt.belt_hash(x).hex() == (
        "749e4c3653aece5e48db4761227742eb6dbe13f4a80f7beff1a9cf8d10ee7786")


def test_reference_signature_vector():
    vk = bign.VerifyingKey.from_sec1_bytes(PUB)
    assert vk.verify(b"testing", SIG)
    bad = bytearray(SIG)
    bad[5] ^= 1
    assert not vk.verify(b"testing", bytes(bad))
    assert not vk.verify(b"testing!", SIG)


def test_sign_verify_roundtrip(rng):
    c = get_curve("bign256")
    sk = bign.SigningKey(c, rng.randrange(1, c.n))
    vk = sk.verifying_key()
    msgs = [b"alpha", b"beta", b"gamma"]
    sigs = bign.sign_batch(c, [sk.d] * 3, msgs)
    assert bign.verify_batch(c, [vk.point] * 3, msgs, sigs) == [True] * 3
    # truncated signature rejected
    assert not vk.verify(b"alpha", sigs[0][:-1])
