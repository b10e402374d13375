#!/usr/bin/env python3
"""End-to-end public-API drive (the /verify evidence script).

Exercises the library the way a reference user would — keys, signatures,
codecs, protocols, MSM — asserting at every step, and prints one PASS line
per surface. Run on CPU (no TPU needed):

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        JAX_COMPILATION_CACHE_DIR=/root/.cache/jax-cpu \
        python -u tools/drive.py

Covers: ECDSA sign->DER->verify + tamper reject, SEC1 round-trips,
library-side off-curve rejection (VERDICT r3 item 3), recovery,
pipelined==unchunked equivalence, ECDH agreement + per-lane invalid-peer
errors, Schnorr BIP340, SM2 custom distinguishing ID, key codecs
(PKCS#8/SPKI/PEM/JWK), and Straus/Pippenger/signed MSM vs the host oracle.
"""

import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PASS = []


def ok(name):
    PASS.append(name)
    print(f"PASS {name}", flush=True)


def main():
    rng = random.Random(1234)

    from tpu_ecc.curves.specs import get_curve
    from tpu_ecc.encoding import der, keys, sec1
    from tpu_ecc.protocols import ecdh, ecdsa, schnorr, sm2
    from tpu_ecc.parallel import msm as M
    from tpu_ecc.utils import ec_host as H

    # 1. ECDSA: sign -> DER -> verify; tampered message rejected
    sk = ecdsa.SigningKey.random("secp256k1", rng)
    vk = sk.verifying_key()
    msg = b"round-4 drive message"
    sig = sk.sign(msg)
    r, s = der.der_to_sig(sig)          # strict-DER decode must succeed
    assert der.sig_to_der(r, s) == sig
    assert vk.verify(msg, sig)
    assert not vk.verify(msg + b"!", sig)
    assert not vk.verify(msg, der.sig_to_der(r, (s + 1) % sk.curve.n))
    ok("ecdsa sign->DER->verify + tamper reject (k256)")

    # 2. SEC1 round-trips, compressed + uncompressed, and VerifyingKey codec
    for compress in (True, False):
        b = vk.to_sec1_bytes(compress)
        vk2 = ecdsa.VerifyingKey.from_sec1_bytes("secp256k1", b)
        assert vk2.point == vk.point
    ok("SEC1 point round-trips (compressed/uncompressed)")

    # 3. Library-side validation: off-curve / out-of-range keys rejected by
    #    verify_batch itself (no caller pre-check)
    c = sk.curve
    z = ecdsa.digest_to_z(c, ecdsa.hash_msg(c, msg))
    bad_pt = (vk.point[0], (vk.point[1] + 1) % c.p)       # off-curve
    res = ecdsa.verify_batch(c, [vk.point, bad_pt, (c.p, 5)], [z] * 3,
                             [(r, s)] * 3)
    assert res == [True, False, False], res
    ok("library-side off-curve/out-of-range key rejection")

    # 4. Recovery
    r2, s2, recid = sk.sign_recoverable(msg)
    rec = ecdsa.recover_public_key(c, z, r2, s2, recid)
    assert rec == vk.point
    ok("public-key recovery round-trip")

    # 5. Pipelined chunked batch == unchunked batch (bit-identical)
    B = 96
    ds = [rng.randrange(1, c.n) for _ in range(B)]
    zs = [rng.randrange(1, c.n) for _ in range(B)]
    sigs_chunked = ecdsa.sign_batch(c, ds, zs, chunk=32)
    sigs_plain = ecdsa.sign_batch(c, ds, zs)
    assert sigs_chunked == sigs_plain
    pubs = [ecdsa.SigningKey(c, d).verifying_key().point for d in ds[:8]]
    oks = ecdsa.verify_batch(c, pubs, zs[:8],
                             [(rr, ss) for rr, ss, _ in sigs_plain[:8]],
                             chunk=4)
    assert all(oks)
    ok("pipelined chunked == unchunked; batch verify green")

    # 6. ECDH: agreement + per-lane invalid peers (off-curve, identity-result)
    a = ecdh.EphemeralSecret.random("p256", rng)
    b_ = ecdh.EphemeralSecret.random("p256", rng)
    sab = a.diffie_hellman(b_.public_key())
    sba = b_.diffie_hellman(a.public_key())
    assert sab.raw_secret_bytes() == sba.raw_secret_bytes()
    assert sab.extract() == sba.extract()
    p256 = get_curve("p256")
    gx, gy = H.aff_generator(p256)
    res = ecdh.diffie_hellman_batch(p256, [a.d, a.d], [(gx, (gy + 1) % p256.p),
                                                       b_.public_key()])
    assert res[0] is None and res[1] is not None
    ok("ECDH agreement + per-lane invalid-peer None")

    # 7. Schnorr BIP340
    ssk = schnorr.SigningKey.from_bytes(rng.randrange(1, c.n).to_bytes(32, "big"))
    svk = ssk.verifying_key()
    ssig = ssk.sign_with_aux_rand(b"\xaa" * 32, b"\xbb" * 32)
    assert svk.verify(b"\xaa" * 32, ssig)
    assert not svk.verify(b"\xab" + b"\xaa" * 31, ssig)
    ok("Schnorr BIP340 sign/verify + tamper reject")

    # 8. SM2 with a custom distinguishing ID; wrong ID rejected
    smk = sm2.SigningKey(get_curve("sm2"), rng.randrange(1, get_curve("sm2").n),
                         ident=b"drive@example.com")
    smv = smk.verifying_key()
    rr, ss = smk.sign(b"sm2 drive")
    assert smv.verify(b"sm2 drive", rr, ss)
    wrong = sm2.VerifyingKey(smv.curve, smv.point, ident=b"other@example.com")
    assert not wrong.verify(b"sm2 drive", rr, ss)
    ok("SM2 custom-ID sign/verify; wrong-ID reject")

    # 9. Key codecs: PKCS#8 / SPKI / PEM / JWK round-trips
    d = sk.d
    assert keys.pkcs8_decode(keys.pkcs8_encode(c, d)) == (c, d)
    assert keys.pkcs8_from_pem(keys.pkcs8_to_pem(c, d)) == (c, d)
    cc, pt = keys.spki_decode(keys.spki_encode(c, vk.point))
    assert (cc, pt) == (c, vk.point)
    cc, pt, dd = keys.jwk_decode(keys.jwk_encode(c, vk.point, d))
    assert (cc, pt, dd) == (c, vk.point, d)
    ok("PKCS#8/SPKI/PEM/JWK key codec round-trips")

    # 10. MSM: Straus + Pippenger (unsigned and signed digits) vs host oracle
    G = H.aff_generator(c)
    pts = [H.aff_mul(c, rng.randrange(1, c.n), G) for _ in range(8)] * 8
    ks = [rng.randrange(0, 1 << 16) for _ in range(64)]
    ks[3] = 0
    want = None
    for p_, k in zip(pts, ks):
        want = H.aff_add(c, want, H.aff_mul(c, k, p_))
    assert M.msm(c, pts, ks, terms=2, scalar_bits=16) == want
    assert M.msm(c, pts, ks, method="pippenger", w=5, lanes=16,
                 scalar_bits=16) == want
    assert M.msm(c, pts, ks, method="pippenger", w=5, lanes=16,
                 scalar_bits=16, signed=True) == want
    ok("MSM straus/pippenger/signed == host oracle")

    # 11. (round 5) message-level batched ECDSA — the native sha256 batch
    # on the hot path — and the ct device-comb pubkey derivation
    from tpu_ecc.ops import scalarmul as SM
    c = get_curve("secp256k1")
    ds = [rng.randrange(1, c.n) for _ in range(4)]
    msgs = [b"drive msg %d" % i for i in range(4)]
    pubs = SM.derive_public_batch(c, ds)
    assert pubs == [H.aff_mul(c, d, H.aff_generator(c)) for d in ds]
    sigs = ecdsa.sign_batch_msgs(c, ds, msgs)
    rs = [(r, s) for (r, s, _) in sigs]
    assert ecdsa.verify_batch_msgs(c, pubs, msgs, rs) == [True] * 4
    assert ecdsa.verify_batch_msgs(c, pubs, [msgs[0] + b"!"] + msgs[1:],
                                   rs) == [False] + [True] * 3
    ok("message-level batched ECDSA (native hashing) + ct pubkey derivation")

    # 12. (round 5) bign-DSA end-to-end through the native BelT kernels
    from tpu_ecc.protocols import bign
    cb = get_curve("bign256")
    dsb = [rng.randrange(1, cb.n) for _ in range(3)]
    msgsb = [b"bign %d" % i for i in range(3)]
    sigsb = bign.sign_batch(cb, dsb, msgsb)
    pubsb = [bign.SigningKey(cb, d).verifying_key().point for d in dsb]
    assert bign.verify_batch(cb, pubsb, msgsb, sigsb) == [True] * 3
    bad = bytes([sigsb[0][0] ^ 1]) + sigsb[0][1:]
    assert bign.verify_batch(cb, pubsb[:1], msgsb[:1], [bad]) == [False]
    ok("bign-DSA sign/verify via native BelT + tamper reject")

    print(f"\nDRIVE GREEN: {len(PASS)}/12 surfaces")


if __name__ == "__main__":
    main()
