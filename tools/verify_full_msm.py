#!/usr/bin/env python3
"""TPU verification run for the fused-kernel Pippenger path (now the TPU
default: segscan + grid-stepped fixup/bucket/horner kernels)
(fused fix-up + bucket-reduce kernels, ops/pallas_kernels.py).

1. Correctness: msm_pippenger(kernels="full") vs the default path vs the host
   oracle at a moderate N on the real chip — bit-equality of packed limbs.
2. Timing: 2^20 points, kernels=None (segscan only) vs kernels="full".

Paste results into PERF.md; promotion decision happens in parallel/msm.py.
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


def build_inputs(curve, N, rng):
    import jax.numpy as jnp
    from tpu_ecc.utils import ec_host as H
    from tpu_ecc.utils.bigint import int_to_limbs

    f, s = curve.field, curve.scalar
    G = H.aff_generator(curve)
    base = [H.aff_mul(curve, int(k), G) for k in rng.integers(1, 2**31, 8)]
    xs8 = np.array([int_to_limbs(f.encode_int(p[0]), f.n_limbs, f.limb_bits)
                    for p in base], np.uint32).T
    ys8 = np.array([int_to_limbs(f.encode_int(p[1]), f.n_limbs, f.limb_bits)
                    for p in base], np.uint32).T
    xs_l = jnp.asarray(np.tile(xs8, N // 8))
    ys_l = jnp.asarray(np.tile(ys8, N // 8))
    inf = jnp.zeros((N,), bool)
    k_np = rng.integers(0, 1 << s.limb_bits, (s.n_limbs, N)).astype(np.uint32)
    k_np[-1] = 0
    return base, xs_l, ys_l, inf, jnp.asarray(k_np), k_np


def host_expect(curve, base, k_np):
    """Oracle via per-base-point scalar sums (points tile the 8 base points)."""
    from tpu_ecc.utils import ec_host as H

    s = curve.scalar
    N = k_np.shape[1]
    vals = np.zeros(N, object)
    for li in range(s.n_limbs):
        vals += k_np[li].astype(object) << (s.limb_bits * li)
    acc = None
    for i in range(8):
        ktot = int(np.sum(vals[i::8])) % curve.n
        acc = H.aff_add(curve, acc, H.aff_mul(curve, ktot, base[i]))
    return acc


def main():
    import jax
    import jax.numpy as jnp
    from tpu_ecc.curves.specs import get_curve
    from tpu_ecc.ops import fe as F
    from tpu_ecc.ops import points as P
    from tpu_ecc.parallel import msm as M

    curve = get_curve("secp256k1")
    f = curve.field
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(7)

    def run(N, lanes, kernels, k_l, xs_l, ys_l, inf):
        kern = jax.jit(lambda a, b, c, d: P.point_limbs(M.msm_pippenger(
            curve, F.fe_steady(f, a), F.fe_steady(f, b), c, d,
            w=13, lanes=lanes, kernels=kernels)))
        t0 = time.perf_counter()
        out = kern(xs_l, ys_l, inf, k_l)
        got = np.asarray(out)
        print(f"  N=2^{N.bit_length()-1} lanes={lanes} kernels={kernels}: "
              f"first call {time.perf_counter()-t0:.1f}s")
        return got, kern

    # --- correctness at N=2^14 ---
    N = 1 << 14
    base, xs_l, ys_l, inf, k_l, k_np = build_inputs(curve, N, rng)
    got_def, _ = run(N, 2048, False, k_l, xs_l, ys_l, inf)   # XLA graphs
    got_full, _ = run(N, 2048, "full", k_l, xs_l, ys_l, inf)  # all kernels
    assert np.array_equal(got_def, got_full), "full-kernel path != XLA"
    pt = P.point_from_limbs(curve, jnp.asarray(got_full))
    x, y, is_inf = jax.jit(P.to_affine)(pt)
    want = host_expect(curve, base, k_np)
    assert not bool(np.asarray(is_inf))
    assert (F.fe_to_ints(x)[0], F.fe_to_ints(y)[0]) == want, "oracle mismatch"
    print("  correctness OK (bit-equal + host oracle)")

    # --- timing at 2^20 ---
    N = 1 << 20
    base, xs_l, ys_l, inf, k_l, k_np = build_inputs(curve, N, rng)
    for kernels in (False, "full"):
        got, kern = run(N, 8192, kernels, k_l, xs_l, ys_l, inf)
        t = float("inf")
        kk = k_l
        for _ in range(5):
            kk = jnp.roll(kk, 1, axis=-1)
            np.asarray(kk[0, :1])
            t0 = time.perf_counter()
            out = kern(xs_l, ys_l, inf, kk)
            np.asarray(out[0, :1])
            t = min(t, time.perf_counter() - t0)
        print(f"  2^20 kernels={kernels}: {t:.3f}s  {N/t:.3e} points/s")


if __name__ == "__main__":
    main()
