"""Native C++ host kernels (tpu_ecc/native): bit-exact vs the Python paths."""

import hashlib

import pytest

from tpu_ecc import native
from tpu_ecc.curves.specs import get_curve
from tpu_ecc.protocols import rfc6979


def _require_lib():
    if native.get_lib() is None:
        pytest.skip("no C++ toolchain available")


def test_sha256_batch_matches_hashlib(rng):
    _require_lib()
    msgs = [bytes([rng.randrange(256) for _ in range(40)]) for _ in range(17)]
    got = native.sha256_batch(msgs, 40)
    assert got == [hashlib.sha256(m).digest() for m in msgs]


def test_rfc6979_native_matches_python(rng):
    _require_lib()
    c = get_curve("secp256k1")
    n = c.n
    xs = [rng.randrange(1, n) for _ in range(32)]
    h1s = [hashlib.sha256(str(i).encode()).digest() for i in range(32)]
    want = [rfc6979.generate_k(n, x, h, "sha256") for x, h in zip(xs, h1s)]
    got = native.rfc6979_k_sha256_batch(n, xs, h1s)
    assert got == want
    # the batch entry point routes through the native kernel transparently
    assert rfc6979.generate_k_batch(n, xs, h1s) == want
    # digest above q exercises the bits2octets reduction branch
    big = b"\xff" * 32
    assert native.rfc6979_k_sha256_batch(n, xs[:1], [big])[0] == \
        rfc6979.generate_k(n, xs[0], big)


def test_rfc6979_rejection_loop():
    """A (q, x, h1) pair whose first HMAC output is >= q would exercise the
    retry loop; brute-force a tiny search to hit at least the comparison path
    on both engines for equality across many inputs."""
    _require_lib()
    c = get_curve("p256")
    n = c.n
    h1s = [hashlib.sha256(bytes([i])).digest() for i in range(64)]
    xs = list(range(1, 65))
    want = [rfc6979.generate_k(n, x, h, "sha256") for x, h in zip(xs, h1s)]
    assert native.rfc6979_k_sha256_batch(n, xs, h1s) == want


def test_sm3_batch_matches_hashlib(rng):
    _require_lib()
    msgs = [bytes([rng.randrange(256) for _ in range(55)]) for _ in range(17)]
    got = native.sm3_batch(msgs, 55)
    assert got == [hashlib.new("sm3", m).digest() for m in msgs]
    # GB/T 32905 appendix A vector
    assert native.sm3_batch([b"abc"], 3)[0].hex() == (
        "66c7f0f462eeedd9d1f2d46bdc10e4e24167c4875cf2f7a2297da02b8f4ba8e0")


def test_belt_hash_batch_matches_python(rng):
    """Native BelT vs protocols/belt.py (which self-tests against the STB
    34.101.31 A.1 block vector at import): variable lengths incl. the
    empty message, partial/exact/multi-block boundaries."""
    _require_lib()
    from tpu_ecc.protocols.belt import belt_hash, belt_hash_batch

    msgs = [bytes([rng.randrange(256) for _ in range(L)])
            for L in (0, 1, 13, 31, 32, 33, 63, 64, 65, 100, 321)]
    got = native.belt_hash_batch(msgs)
    want = [belt_hash(m) for m in msgs]
    assert got == want
    # the protocols.belt batch entry routes through the native kernel
    assert belt_hash_batch(msgs) == want


def test_rfc6979_sm3_and_belt_native(rng):
    """The SM2 (HMAC-SM3) and bign (HMAC-BeltHash) nonce kernels vs their
    Python derivations — the sm2/bign sign shells ride these."""
    _require_lib()
    from tpu_ecc.protocols.bign import _generate_k_belt, _generate_k_belt_batch

    n_sm2 = get_curve("sm2").n
    xs = [rng.randrange(1, n_sm2) for _ in range(16)]
    h1s = [hashlib.sha256(str(i).encode()).digest() for i in range(16)]
    want = [rfc6979.generate_k(n_sm2, x, h, "sm3") for x, h in zip(xs, h1s)]
    assert native.rfc6979_k_sm3_batch(n_sm2, xs, h1s) == want
    assert rfc6979.generate_k_batch(n_sm2, xs, h1s, "sm3") == want

    q = get_curve("bign256").n
    want = [_generate_k_belt(q, x, h) for x, h in zip(xs, h1s)]
    assert native.rfc6979_k_belt_batch(q, xs, h1s) == want
    assert _generate_k_belt_batch(q, xs, h1s) == want
