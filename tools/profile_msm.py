#!/usr/bin/env python3
"""Phase-level timing of the 2^20 Pippenger MSM on the real chip.

The full pipeline (bench: ~0.8s at 2^20, w=13, L=8192, 20 windows) is one
jitted scan; this tool times standalone jits of each per-window phase to
attribute the wall clock and pick the next optimization target:

  sort        argsort(dig) (uint32 bitonic)
  gather      payload gather smaj = pl_major[order]  ([N, 3n] rows)
  chunk       val2 transpose [N,3n] -> [C,3,n,L]
  segscan     fused segmented-scan kernel (1 padd/point)
  fixup       grid-stepped lane-stitch kernel
  blookup     searchsorted + end_vals/span_vals gathers + select
  bucket      grid-stepped suffix+tree bucket reduction
  horner      window combine kernel (whole-MSM, not per window)

    python tools/profile_msm.py [log2_N]
"""

import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_REPO, ".cache", "jax-tpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")


def main():
    import jax
    import jax.numpy as jnp

    from tpu_ecc.curves.specs import get_curve
    from tpu_ecc.ops import pallas_kernels as PK
    from tpu_ecc.ops import points as P
    from tpu_ecc.parallel.msm import wide_window_digits
    from tpu_ecc.utils import ec_host as H
    from tpu_ecc.utils.bigint import int_to_limbs
    from tpu_ecc.utils.profiling import time_fn

    logN = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    N, w, L = 1 << logN, 13, 8192
    C = N // L
    nbuck = 1 << w
    curve = get_curve("secp256k1")
    f, s = curve.field, curve.scalar
    n = f.n_limbs
    print(f"device: {jax.devices()[0].device_kind}  N=2^{logN} w={w} L={L}")

    rng = np.random.default_rng(7)
    G = H.aff_generator(curve)
    base = [H.aff_mul(curve, int(k), G) for k in rng.integers(1, 2**31, 8)]
    xs8 = np.array([int_to_limbs(f.encode_int(p[0]), f.n_limbs, f.limb_bits)
                    for p in base], np.uint32).T
    ys8 = np.array([int_to_limbs(f.encode_int(p[1]), f.n_limbs, f.limb_bits)
                    for p in base], np.uint32).T
    one = np.zeros((n, 8), np.uint32)
    one[0] = f.encode_int(1) & f.mask
    for i, limb in enumerate(int_to_limbs(f.encode_int(1), n, f.limb_bits)):
        one[i] = limb
    pl_major = jnp.asarray(np.tile(
        np.stack([xs8, ys8, one], 0).reshape(3 * n, 8), N // 8).T.copy())
    k_np = rng.integers(0, 1 << s.limb_bits, (s.n_limbs, N)).astype(np.uint32)
    k_np[-1] = 0
    digs = jax.jit(lambda k: wide_window_digits(curve, k, w))(
        jnp.asarray(k_np))
    dig0 = digs[0]

    def t(name, fn, *args, iters=16, chain=None):
        jfn = jax.jit(fn)
        per = time_fn(jfn, *args, iters=iters, chain=chain)
        print(f"  {name:10s} {per*1e3:8.3f} ms/window"
              f"  ({per*1e3*(256//w + 1):7.1f} ms over "
              f"{256//w + 1} windows)")
        return jfn(*args)

    # per-window phases (chain via a data dependency where shapes allow)
    nochain = lambda out, a: a  # noqa: E731 — independent re-runs
    order = t("sort", lambda d: jnp.argsort(d), dig0, chain=nochain)
    smaj = t("gather", lambda o: jnp.take(pl_major, o, axis=0), order,
             chain=nochain)
    skey = jnp.sort(dig0)

    def chunk(sm):
        return jax.lax.optimization_barrier(
            jnp.moveaxis(sm.reshape(L, C, 3 * n), 0, -1).reshape(C, 3, n, L))

    val2 = t("chunk", chunk, smaj, chain=nochain)
    key2 = skey.reshape(L, C).T

    seg = PK.segscan_call(curve, C, L, nbuck)
    t("segscan", lambda k2, v2: seg(k2, v2)[2], key2, val2, chain=nochain)
    scanned, last_key, t_l, lead_vals = seg(key2, val2)
    first_key = key2[0]
    fix = PK.fixup_call(curve, L)
    fixed = t("fixup", lambda a, b, c_, d: fix(a, b, c_, d),
              t_l, last_key, first_key, lead_vals, chain=nochain)

    ident1 = P.point_limbs(P.identity(curve))

    def blookup(sk, scn, fx):
        bids = jnp.arange(nbuck, dtype=jnp.uint32)
        bidx = jnp.searchsorted(sk, bids, side="right").astype(jnp.int32) - 1
        safe = jnp.maximum(bidx, 0)
        have = (bidx >= 0) & (jnp.take(sk, safe) == bids)
        lane = safe // C
        pos = safe % C
        end_vals = scn[pos, :, :, lane]
        spans = jnp.take(first_key, lane) == bids
        fixed_t = jnp.moveaxis(fx, -1, 0)
        span_vals = fixed_t[lane]
        ident_b = jnp.broadcast_to(ident1[None], (nbuck, 3, n))
        bv = jnp.where(spans[:, None, None] & have[:, None, None], span_vals,
                       jnp.where(have[:, None, None], end_vals, ident_b))
        return jnp.moveaxis(bv, 0, -1)

    buckets = t("blookup", blookup, skey, scanned, fixed, chain=nochain)

    red = PK.bucket_reduce_call(curve, nbuck)
    t("bucket", lambda b: red(b), buckets, chain=nochain)

    nw = -(-s.bits // w)
    s_b = jnp.broadcast_to(
        jnp.asarray(np.tile(np.asarray(ident1)[None], (nw, 1, 1))
                    )[..., None, None], (nw, 3, n, 8, 128))
    hor = PK.horner_call(curve, w, nw)
    jh = jax.jit(lambda x: hor(x))
    ph = time_fn(jh, s_b, iters=8)
    print(f"  {'horner':10s} {ph*1e3:8.3f} ms (whole MSM, once)")


if __name__ == "__main__":
    main()
