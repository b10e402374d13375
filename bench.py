#!/usr/bin/env python3
"""Benchmark suite (criterion-parity; cf. the reference's per-crate benches
k256/benches/{field,scalar,ecdsa}.rs, p256/benches/*, p384/benches/*).

Default mode prints ONE JSON line — the headline metric the driver records:
    {"metric": "secp256k1 batched point-adds/s/chip", ...}
`python bench.py --full` additionally runs the sub-bench suite (field mul/
square/invert, scalar_mul, mul_by_generator, lincomb, ECDSA sign/verify,
Pippenger MSM at 2^20) and writes BENCHES.json.

Methodology: every device measurement is a fixed-count *dependency-chained*
loop — each call consumes the previous call's output, so enqueue pipelining
cannot hide latency (see PERF.md). Results on the shared-pool chip vary
run-to-run; BENCHES.json records per-bench seconds so regressions are
attributable.
"""

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_REPO, ".cache", "jax-tpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")

RESULTS = []


def record(name, curve, batch, per_call_s, value, unit, tries=None):
    """One bench row. `tries`: the per-attempt rates behind the reported
    number — recorded so the co-tenant-stall dispersion on this shared-pool
    chip is visible per row (VERDICT r3: numbers had unrecorded ±60%
    error bars).

    Per-row estimator semantics (ADVICE r4 — the meaning of `value` vs
    `tries` differs by producer, so it is recorded explicitly):
    - time_fn rows (field/scalar/scalarmul): value is the cross-rep
      min-combined chain-differencing estimate; tries are the per-rep
      PAIRED differences, whose individual rates can exceed value (a
      stall in one window of a pair skews that pair only).
    - msm / e2e percall rows: value == max(tries) (best synchronous call;
      stalls only ever add time).
    - e2e marginal rows: value differences the min-of-tries short window
      against the min-of-tries long window; tries are the per-attempt
      PAIRED size-differenced rates (individual pairs can exceed value).
    `tries == []` (retries exhausted in time_fn) marks the row unreliable.
    """
    est = ("paired-diff" if any(name.startswith(p) for p in
                                ("field_", "scalar_", "lincomb", "mul_by_"))
           else "best-of")
    row = {"name": name, "curve": curve, "batch": batch,
           "secs_per_call": per_call_s, "value": round(value, 1),
           "unit": unit, "estimator": est}
    if not (np.isfinite(per_call_s) and np.isfinite(value)):
        row.update(secs_per_call=None, value=0.0, unreliable=True)
    if tries is not None and len(tries) == 0:
        row["unreliable"] = True
    if tries:
        row["tries"] = [round(t, 1) for t in tries]
        row["spread"] = round(min(tries) / max(max(tries), 1e-9), 3)
    RESULTS.append(row)
    disp = f"  (n={len(tries)}, min/max={row['spread']})" if tries else ""
    if row.get("unreliable"):
        disp += "  UNRELIABLE"
    ms = "   inf   " if not np.isfinite(per_call_s) else f"{per_call_s*1e3:9.3f}"
    print(f"  {name:28s} {curve:10s} B={batch:<8d} "
          f"{ms} ms/call  {row['value']:.3e} {unit}{disp}",
          file=sys.stderr)


def _chain_tweak(out_arr):
    """A data dependency on `out_arr` that is numerically zero but opaque to
    constant folding (limbs are < 2^13 so >>31 is 0)."""
    flat = out_arr
    while flat.ndim > 1:
        flat = flat[0]
    return flat[0] >> np.uint32(31)


def _fetch(arr):
    """Force completion with a REAL device-to-host read of a few bytes.
    `block_until_ready` has been observed to return early through the axon
    tunnel (PERF.md methodology note), so timing windows must close with an
    actual fetch."""
    flat = arr
    while flat.ndim > 1:
        flat = flat[0]
    return np.asarray(flat[:1])


def diff_rate(step, out0, work_per_call, c1=16, c2=80, tries=3):
    """Work rate via chain-length differencing: time a c1-long and a c2-long
    dependency chain (each closed by a real fetch) and divide the extra work
    by the extra time. Fetch latency, dispatch ramp and any fixed per-window
    cost cancel in the difference; the max over `tries` rejects co-tenant
    stalls on the shared-pool chip. Returns (best, out, per_try_rates) so
    callers can record the dispersion."""
    rates = []
    out = out0
    for _ in range(tries):
        def run(count, out):
            t0 = time.perf_counter()
            for _ in range(count):
                out = step(out)
            _fetch(out)
            return time.perf_counter() - t0, out
        t1, out = run(c1, out)
        t2, out = run(c2, out)
        if t2 > t1:
            rates.append((c2 - c1) * work_per_call / (t2 - t1))
    return (max(rates) if rates else 0.0), out, rates


def headline(curve, B=8192, repeat=16, iters=64):
    """Batched secp256k1 point additions per second per chip.

    Measures both production engines — the XLA graph path and the fused
    Mosaic kernel (a REPEAT-long addition chain inside ONE Pallas kernel,
    intermediates never leaving VMEM; 2x the XLA path on v5e, PERF.md) —
    and reports the faster one. Both paths are bit-identical by assertion.
    """
    import jax
    import jax.numpy as jnp
    from tpu_ecc.ops import points as P
    from tpu_ecc.utils import ec_host as H

    G = H.aff_generator(curve)
    rng = np.random.default_rng(42)
    pts_a = [H.aff_mul(curve, int(k), G) for k in rng.integers(1, 2**31, 8)]
    pts_b = [H.aff_mul(curve, int(k), G) for k in rng.integers(1, 2**31, 8)]
    reps = B // 8

    def pack(pts):
        pp = P.from_affine_ints(curve, [p[0] for p in pts] * reps,
                                [p[1] for p in pts] * reps)
        return P.point_limbs(pp)

    a_l, b_l = pack(pts_a), pack(pts_b)

    @jax.jit
    def chain(a, b):
        pa = P.point_from_limbs(curve, a)
        pb = P.point_from_limbs(curve, b)
        for _ in range(repeat):
            pa = P.steady(P.padd(pa, pb))
        return P.point_limbs(pa)

    def measure(fn):
        out = fn(a_l, b_l)
        _fetch(out)              # compile + warmup
        rate, out, rr = diff_rate(lambda o: fn(o, b_l), out, repeat * B,
                                  c1=iters // 4, c2=iters + iters // 4)
        return rate, out, rr

    xla_rate, xla_out, rr = measure(chain)
    record("point_add_xla", curve.name, B, repeat * B / xla_rate, xla_rate,
           "adds/s", tries=rr)
    best = xla_rate
    try:
        from tpu_ecc.ops.pallas_kernels import padd_chain_call

        kern = padd_chain_call(curve, B, min(2048, B), repeat)
        assert jnp.array_equal(np.asarray(chain(a_l, b_l)),
                               np.asarray(kern(a_l, b_l))), \
            "pallas chain != xla chain"
        k_rate, _, rr = measure(kern)
        record("point_add_pallas", curve.name, B, repeat * B / k_rate, k_rate,
               "adds/s", tries=rr)
        best = max(best, k_rate)
    except Exception as e:  # no Mosaic on this backend: XLA number stands
        print(f"  (pallas path unavailable: {type(e).__name__}: {e})",
              file=sys.stderr)
    return best


def bench_field(curve, B=8192, iters=128):
    """iters=128: the mul/square chains must be long enough that the
    multi-ms tunnel jitter is small against the timed window — r4's
    iters=32 windows (~8 ms) recorded spread as low as 0.16 on these rows
    (VERDICT r4 weak 4); 128 puts ~30 ms of real work in the window."""
    import jax
    from tpu_ecc.ops import fe as F
    from tpu_ecc.utils.profiling import time_fn

    f = curve.field
    rng = np.random.default_rng(1)
    vals = [int.from_bytes(rng.bytes(f.bits // 8), "big") % f.p
            for _ in range(8)] * (B // 8)
    a_l = F.fe_from_ints(f, vals).limbs
    b_l = F.fe_from_ints(f, vals[::-1]).limbs

    def wrap(op, nargs=2):
        def fn(*ls):
            fes = [F.fe_steady(f, l) for l in ls]
            return F._steady(op(*fes)).limbs
        return jax.jit(fn)

    t, tr = time_fn(wrap(F.fmul), a_l, b_l, iters=iters, return_tries=True)
    record("field_mul", curve.name, B, t, B / t, "muls/s",
           tries=[B / x for x in tr])
    t, tr = time_fn(wrap(F.fsquare), a_l, iters=iters, return_tries=True)
    record("field_square", curve.name, B, t, B / t, "squares/s",
           tries=[B / x for x in tr])
    t, tr = time_fn(wrap(F.finv), a_l, iters=16, return_tries=True)
    record("field_invert", curve.name, B, t, B / t, "inverts/s",
           tries=[B / x for x in tr])
    # kernel-on/off A-B for the fused pow_call chain (VERDICT r3 item 1c):
    # the row above runs the default (pow kernel on TPU); this one forces
    # the XLA scan path for the same Fermat chain.
    kern_env = os.environ.get("TPU_ECC_KERNELS")
    os.environ["TPU_ECC_KERNELS"] = "0"
    try:
        t = time_fn(wrap(F.finv), a_l, iters=8)
        record("field_invert_xla", curve.name, B, t, B / t, "inverts/s")
    finally:
        if kern_env is None:
            os.environ.pop("TPU_ECC_KERNELS", None)
        else:
            os.environ["TPU_ECC_KERNELS"] = kern_env


def bench_scalar_field(curve, B=8192, iters=128):
    """Scalar-field (group order) op rows — the reference benches scalar ops
    separately (k256/benches/scalar.rs:32-39): mul, invert, negate.
    iters=128 for the fast ops: see bench_field."""
    import jax
    from tpu_ecc.ops import fe as F
    from tpu_ecc.utils.profiling import time_fn

    s = curve.scalar
    rng = np.random.default_rng(6)
    vals = [int.from_bytes(rng.bytes(s.bits // 8), "big") % s.p
            for _ in range(8)] * (B // 8)
    a_l = F.fe_from_ints(s, vals).limbs
    b_l = F.fe_from_ints(s, vals[::-1]).limbs

    def wrap(op):
        def fn(*ls):
            fes = [F.fe_steady(s, l) for l in ls]
            return F._steady(op(*fes)).limbs
        return jax.jit(fn)

    t, tr = time_fn(wrap(F.fmul), a_l, b_l, iters=iters, return_tries=True)
    record("scalar_field_mul", curve.name, B, t, B / t, "muls/s",
           tries=[B / x for x in tr])
    neg_fn = jax.jit(lambda l: F.fcanonical(
        F.fneg(F.fe_steady(s, l))).limbs)
    t, tr = time_fn(neg_fn, a_l, iters=iters, return_tries=True)
    record("scalar_negate", curve.name, B, t, B / t, "negs/s",
           tries=[B / x for x in tr])
    t, tr = time_fn(wrap(F.finv), a_l, iters=16, return_tries=True)
    record("scalar_invert", curve.name, B, t, B / t, "inverts/s",
           tries=[B / x for x in tr])


def bench_scalarmul(curve, B=1024, iters=4):
    import jax
    from tpu_ecc.ops import fe as F
    from tpu_ecc.ops import points as P
    from tpu_ecc.ops import scalarmul as SM
    from tpu_ecc.utils import ec_host as H
    from tpu_ecc.utils.profiling import time_fn

    G = H.aff_generator(curve)
    rng = np.random.default_rng(2)
    base = [H.aff_mul(curve, int(k), G) for k in rng.integers(1, 2**31, 8)]
    pp = P.from_affine_ints(curve, [p[0] for p in base] * (B // 8),
                            [p[1] for p in base] * (B // 8))
    p_l = P.point_limbs(pp)
    ks = [int.from_bytes(rng.bytes(curve.scalar_bytes), "big") % curve.n
          for _ in range(B)]
    k_l = SM.pack_scalars(curve, ks)

    @jax.jit
    def smul(pl, kl):
        return P.point_limbs(P.steady(
            SM.scalar_mul(P.point_from_limbs(curve, pl), kl)))

    chain = lambda out, a: (out, a[1])  # noqa: E731
    t, tr = time_fn(smul, p_l, k_l, iters=iters, chain=chain,
                    return_tries=True)
    record("scalar_mul", curve.name, B, t, B / t, "muls/s",
           tries=[B / x for x in tr])

    @jax.jit
    def mbg(kl):
        return P.point_limbs(P.steady(SM.mul_by_generator(curve, kl)))

    chain = lambda out, a: (a[0] ^ _chain_tweak(out),)  # noqa: E731
    t, tr = time_fn(mbg, k_l, iters=iters, chain=chain, return_tries=True)
    record("mul_by_generator", curve.name, B, t, B / t, "muls/s",
           tries=[B / x for x in tr])

    k2_l = SM.pack_scalars(curve, [k + 7 for k in ks])

    @jax.jit
    def lin(pl, k1, k2):
        Q = P.point_from_limbs(curve, pl)
        Gb = P.generator(curve, Q.batch_shape)
        return P.point_limbs(P.steady(SM.lincomb([(Gb, k1), (Q, k2)])))

    chain = lambda out, a: (out, a[1], a[2])  # noqa: E731
    t, tr = time_fn(lin, p_l, k_l, k2_l, iters=iters, chain=chain,
                    return_tries=True)
    record("lincomb_2term", curve.name, B, t, B / t, "lincombs/s",
           tries=[B / x for x in tr])


def bench_ecdsa(name, B=8192, chunk=4096, iters=3):
    """End-to-end sign/verify/recover: host prep (RFC 6979, word packing)
    + chunk-pipelined device cores + D2H (protocols/ecdsa._run_pipelined).

    Two methodologies per op:
    - percall: one synchronous batch call — what a single caller sees
      through this dev box's ~30ms tunnel (includes the full RTT).
    - marginal (the headline row): size-differencing over the PIPELINED
      shell — time a 1x-batch and a 3x-batch call and divide the extra
      work by the extra time; the fixed tunnel RTT and dispatch ramp
      cancel, leaving the service's steady-state throughput.
    """
    import random
    from tpu_ecc.curves.specs import get_curve
    from tpu_ecc.protocols import ecdsa

    c = get_curve(name)
    sk = ecdsa.SigningKey.random(name, random.Random(5))
    vk = sk.verifying_key()
    rng = np.random.default_rng(3)
    B2 = 3 * B
    zs = [int.from_bytes(rng.bytes(32), "big") % c.n for _ in range(B2)]
    ds = [sk.d] * B2
    pubs = [vk.point] * B2
    sigs = ecdsa.sign_batch(c, ds, zs, chunk=chunk)   # warmup + compile
    rs = [(r, s) for (r, s, _) in sigs]
    assert all(ecdsa.verify_batch(c, pubs[:B], zs[:B], rs[:B], chunk=chunk))
    # recover shares the chunked-core shape but is its OWN program: warm it
    # too, or its first timed try records compile time as dispersion
    # (ADVICE r4 medium)
    ecdsa.recover_batch(c, zs[:chunk], sigs[:chunk], chunk=chunk)

    def rates(fn):
        return _e2e_rates(fn, B, B2, iters)

    t, m, tr, mtr = rates(lambda b: ecdsa.sign_batch(c, ds[:b], zs[:b],
                                                     chunk=chunk))
    record("ecdsa_sign_e2e_percall", name, B, t, B / t, "sigs/s",
           tries=[B / x for x in tr])
    record("ecdsa_sign_e2e", name, B, (B2 - B) / m if m else 0, m, "sigs/s",
           tries=mtr)
    t, m, tr, mtr = rates(lambda b: ecdsa.verify_batch(c, pubs[:b], zs[:b],
                                                       rs[:b], chunk=chunk))
    record("ecdsa_verify_e2e_percall", name, B, t, B / t, "verifies/s",
           tries=[B / x for x in tr])
    record("ecdsa_verify_e2e", name, B, (B2 - B) / m if m else 0, m,
           "verifies/s", tries=mtr)
    t, m, tr, mtr = rates(lambda b: ecdsa.recover_batch(c, zs[:b], sigs[:b],
                                                        chunk=chunk))
    record("ecdsa_recover_e2e_percall", name, B, t, B / t, "recovers/s",
           tries=[B / x for x in tr])
    record("ecdsa_recover_e2e", name, B, (B2 - B) / m if m else 0, m,
           "recovers/s", tries=mtr)


def _e2e_rates(fn, B, B2, iters):
    """Shared e2e methodology (see bench_ecdsa): best-of percall at B and
    B2, marginal = size-differenced, with paired per-try marginal rates."""
    def best_of(b):
        times = []
        for _ in range(max(iters, 4)):
            t0 = time.perf_counter()
            fn(b)
            times.append(time.perf_counter() - t0)
        return min(times), times

    t1, tries1 = best_of(B)
    t2, tries2 = best_of(B2)
    marg = (B2 - B) / (t2 - t1) if t2 > t1 else 0.0
    mtries = [(B2 - B) / (b - a) for a, b in zip(tries1, tries2) if b > a]
    return t1, marg, tries1, mtries


def bench_protocol_extras(B=8192, chunk=4096, iters=3):
    """Schnorr/SM2/bign e2e rows (VERDICT r4 weak 2: these protocols had no
    recorded throughput at all). Same marginal methodology as bench_ecdsa;
    all three shells are chunk-pipelined with native-C++ host hashing."""
    import random
    from tpu_ecc.curves.specs import get_curve
    from tpu_ecc.protocols import schnorr, sm2, bign

    rng = np.random.default_rng(8)
    rd = random.Random(11)
    B2 = 3 * B

    def rows(tag, curve_name, sign_fn, verify_fn):
        t, m, tr, mtr = _e2e_rates(sign_fn, B, B2, iters)
        record(f"{tag}_sign_e2e_percall", curve_name, B, t, B / t, "sigs/s",
               tries=[B / x for x in tr])
        record(f"{tag}_sign_e2e", curve_name, B, (B2 - B) / m if m else 0, m,
               "sigs/s", tries=mtr)
        t, m, tr, mtr = _e2e_rates(verify_fn, B, B2, iters)
        record(f"{tag}_verify_e2e_percall", curve_name, B, t, B / t,
               "verifies/s", tries=[B / x for x in tr])
        record(f"{tag}_verify_e2e", curve_name, B, (B2 - B) / m if m else 0,
               m, "verifies/s", tries=mtr)

    # --- Schnorr BIP340 (secp256k1)
    c = get_curve("secp256k1")
    ds = [rd.randrange(1, c.n) for _ in range(64)] * (B2 // 64)
    msgs = [rng.bytes(32) for _ in range(B2)]
    auxs = [rng.bytes(32) for _ in range(B2)]
    sigs = schnorr.sign_batch(c, ds, msgs, auxs, chunk=chunk)  # warm+compile
    pxs = schnorr.xonly_public_keys(c, ds, chunk=chunk)
    assert all(schnorr.verify_batch(c, pxs[:B], msgs[:B], sigs[:B],
                                    chunk=chunk))
    rows("schnorr", "secp256k1",
         lambda b: schnorr.sign_batch(c, ds[:b], msgs[:b], auxs[:b],
                                      chunk=chunk),
         lambda b: schnorr.verify_batch(c, pxs[:b], msgs[:b], sigs[:b],
                                        chunk=chunk))

    # --- SM2-DSA
    c = get_curve("sm2")
    ds64 = [rd.randrange(1, c.n) for _ in range(64)]
    from tpu_ecc.ops import scalarmul as SMm
    pubs64 = SMm.derive_public_batch(c, ds64)
    ds = ds64 * (B2 // 64)
    pubs = pubs64 * (B2 // 64)
    es = [int.from_bytes(rng.bytes(32), "big") % c.n for _ in range(B2)]
    sigs = sm2.sign_batch(c, ds, es, chunk=chunk)
    assert all(sm2.verify_batch(c, pubs[:B], es[:B], sigs[:B], chunk=chunk))
    rows("sm2", "sm2",
         lambda b: sm2.sign_batch(c, ds[:b], es[:b], chunk=chunk),
         lambda b: sm2.verify_batch(c, pubs[:b], es[:b], sigs[:b],
                                    chunk=chunk))

    # --- bign-DSA (message hashing inside both shells, native belt kernels)
    c = get_curve("bign256")
    ds64 = [rd.randrange(1, c.n) for _ in range(64)]
    pubs64 = SMm.derive_public_batch(c, ds64)
    ds = ds64 * (B2 // 64)
    pubs = pubs64 * (B2 // 64)
    msgs = [rng.bytes(32) for _ in range(B2)]
    sigs = bign.sign_batch(c, ds, msgs, chunk=chunk)
    assert all(bign.verify_batch(c, pubs[:B], msgs[:B], sigs[:B],
                                 chunk=chunk))
    rows("bign", "bign256",
         lambda b: bign.sign_batch(c, ds[:b], msgs[:b], chunk=chunk),
         lambda b: bign.verify_batch(c, pubs[:b], msgs[:b], sigs[:b],
                                     chunk=chunk))


def bench_msm(curve, log_n=20, w=13, lanes=8192, iters=3, kernels=None,
              tag="", signed=False):
    """Pippenger MSM at 2^log_n points (the BASELINE.md north-star shape)."""
    import jax
    import jax.numpy as jnp
    from tpu_ecc.ops import fe as F
    from tpu_ecc.ops import points as P
    from tpu_ecc.parallel import msm as M
    from tpu_ecc.utils import ec_host as H
    from tpu_ecc.utils.bigint import int_to_limbs

    N = 1 << log_n
    f, s = curve.field, curve.scalar
    G = H.aff_generator(curve)
    rng = np.random.default_rng(4)
    base = [H.aff_mul(curve, int(k), G) for k in rng.integers(1, 2**31, 8)]
    xs8 = np.array([int_to_limbs(f.encode_int(p[0]), f.n_limbs, f.limb_bits)
                    for p in base], np.uint32).T   # [n, 8]
    ys8 = np.array([int_to_limbs(f.encode_int(p[1]), f.n_limbs, f.limb_bits)
                    for p in base], np.uint32).T
    xs_l = jnp.asarray(np.tile(xs8, N // 8))
    ys_l = jnp.asarray(np.tile(ys8, N // 8))
    inf = jnp.zeros((N,), bool)
    # random ~full-width scalars, generated directly in limb form (no host
    # bigint loop at N=2^20): uniform limbs below the top limb keep k < n
    k_np = rng.integers(0, 1 << s.limb_bits, (s.n_limbs, N)).astype(np.uint32)
    k_np[-1] = 0
    k_l = jnp.asarray(k_np)

    kern = jax.jit(lambda a, b, c, d: P.point_limbs(M.msm_pippenger(
        curve, F.fe_steady(f, a), F.fe_steady(f, b), c, d, w=w, lanes=lanes,
        kernels=kernels, signed=signed)))
    out = kern(xs_l, ys_l, inf, k_l)
    _fetch(out)
    # min over iters: co-tenant stalls on the shared-pool chip reach seconds;
    # the min is the uncontended device time; per-call windows close with a
    # real fetch (~60ms bias on a multi-hundred-ms call)
    t = float("inf")
    tr = []
    for _ in range(max(iters, 5)):
        k_l = jnp.roll(k_l, 1, axis=-1) ^ _chain_tweak(out)
        _fetch(k_l)
        t0 = time.perf_counter()
        out = kern(xs_l, ys_l, inf, k_l)
        _fetch(out)
        dt = time.perf_counter() - t0
        t = min(t, dt)
        tr.append(N / dt)
    record(f"msm_pippenger{tag}_2^{log_n}", curve.name, N, t, N / t,
           "points/s", tries=tr)
    return N / t


def main():
    full = "--full" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]

    from tpu_ecc.curves.specs import get_curve

    k256 = get_curve("secp256k1")
    B = int(args[0]) if args else 8192
    adds_per_sec = headline(k256, B=B)

    if full:
        # criterion-parity curve set: the reference ships benches for
        # k256/p256/p384/bign256 ({k256,p256,p384,bign256}/benches/)
        for name in ("secp256k1", "p256", "p384", "bign256"):
            bench_field(get_curve(name))
        for name in ("secp256k1", "p256"):
            bench_scalar_field(get_curve(name))
        for name in ("secp256k1", "p256", "p384", "bign256"):
            bench_scalarmul(get_curve(name))
        for name in ("secp256k1", "p256", "p384"):
            bench_ecdsa(name)
        bench_protocol_extras()
        # fused kernels (segscan + grid-stepped fixup/bucket/horner) are the
        # TPU default since round 3; signed-digit w=14 recoding (halved
        # buckets, in-kernel y-negation) is the round-4 production default —
        # the headline row. --msm-xla adds the graph-path row.
        bench_msm(k256, log_n=20, w=14, signed=True)
        bench_msm(k256, log_n=20, w=13, tag="_unsigned_w13")
        if "--msm-xla" in sys.argv:
            bench_msm(k256, log_n=20, kernels=False, tag="_xla")
        import jax
        payload = {
            "hardware": str(jax.devices()[0]),
            "jax": jax.__version__,
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "benches": RESULTS,
        }
        with open(os.path.join(_REPO, "BENCHES.json"), "w") as fh:
            json.dump(payload, fh, indent=1)
        print(f"wrote BENCHES.json ({len(RESULTS)} benches)", file=sys.stderr)

    print(json.dumps({
        "metric": "secp256k1 batched point-adds/s/chip",
        "value": round(adds_per_sec, 1),
        "unit": "adds/s",
        "vs_baseline": round(adds_per_sec / 1e8, 4),
    }))


if __name__ == "__main__":
    main()
