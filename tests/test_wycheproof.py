"""Wycheproof ECDSA conformance suites (split from test_ecdsa.py: one
pytest process accumulates enough XLA:CPU compiler state over the preceding
ECDSA cores that the wycheproof verify compile can hit the known compiler
segfault flake — tools/run_tests.sh isolates crashes per FILE, so the suite
lives in its own process).

Runner semantics match k256/src/ecdsa.rs:351-425: parse strict DER,
normalize s for k256, verify. NO caller-side on-curve or range pre-check —
public-key validation is the library's job (verify_batch)."""

import json
import os

import pytest

from tpu_ecc.curves.specs import get_curve
from tpu_ecc.encoding import der
from tpu_ecc.protocols import ecdsa

VEC_DIR = os.path.join(os.path.dirname(__file__), "vectors")


def _run_wycheproof(name, batch=64):
    c = get_curve(name)
    vecs = json.load(open(os.path.join(VEC_DIR, f"wycheproof_{name}.json")))
    low_s = name in ecdsa.LOW_S_CURVES
    items = []
    results = {}
    for i, v in enumerate(vecs):
        wx, wy = int(v["wx"], 16), int(v["wy"], 16)
        msg = bytes.fromhex(v["msg"])
        # NO on-curve / range pre-check here: public-key validation is the
        # library's job (verify_batch rejects out-of-range and off-curve
        # keys itself, like primeorder/src/affine.rs:164-195)
        try:
            r, s = der.der_to_sig(bytes.fromhex(v["sig"]))
        except der.DerError:
            results[i] = False
            continue
        if low_s and s > c.n // 2:
            s = c.n - s  # normalize_s like the k256 runner
        if not (0 < r < c.n and 0 < s < c.n):
            results[i] = False
            continue
        z = ecdsa.digest_to_z(c, ecdsa.hash_msg(c, msg))
        items.append((i, (wx, wy), z, (r, s)))
    # batched device verification
    for start in range(0, len(items), batch):
        chunk = items[start: start + batch]
        oks = ecdsa.verify_batch(
            c, [it[1] for it in chunk], [it[2] for it in chunk],
            [it[3] for it in chunk], low_s=False)
        for (i, *_), ok in zip(chunk, oks):
            results[i] = ok
    fails = [
        i for i, v in enumerate(vecs) if results[i] != v["ok"]
    ]
    assert not fails, f"{name}: {len(fails)} wycheproof mismatches, e.g. {fails[:5]}"


@pytest.mark.parametrize("name", ["secp256k1", "p256"])
def test_wycheproof(name):
    _run_wycheproof(name)


@pytest.mark.slow
@pytest.mark.parametrize("name", ["p224", "p384", "p521"])
def test_wycheproof_slow(name):
    _run_wycheproof(name)


