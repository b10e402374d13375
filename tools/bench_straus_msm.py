#!/usr/bin/env python3
"""TPU verification + bench of the Straus (secret-scalar) MSM path routed
through the fused ladder kernels (parallel/msm._lincomb_terms ->
scalarmul.lincomb_auto): correctness vs the host oracle and vs the XLA
graph path (TPU_ECC_KERNELS gate), then points/s for both engines.

    python tools/bench_straus_msm.py [log2_N] [terms]
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
    from tpu_ecc.ops import fe as F
    from tpu_ecc.ops import points as P
    from tpu_ecc.ops import scalarmul as SM
    from tpu_ecc.parallel import msm as M
    from tpu_ecc.utils import ec_host as H
    from tpu_ecc.utils.bigint import int_to_limbs

    logN = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    N = 1 << logN
    curve = get_curve("secp256k1")
    f = curve.field
    print(f"device: {jax.devices()[0].device_kind}  N=2^{logN} terms={T}")

    rng = np.random.default_rng(11)
    G = H.aff_generator(curve)
    base = [H.aff_mul(curve, int(k), G) for k in rng.integers(1, 2**31, 8)]
    xs8 = np.array([int_to_limbs(f.encode_int(p[0]), f.n_limbs, f.limb_bits)
                    for p in base], np.uint32).T
    ys8 = np.array([int_to_limbs(f.encode_int(p[1]), f.n_limbs, f.limb_bits)
                    for p in base], np.uint32).T
    xs_l = jnp.asarray(np.tile(xs8, N // 8))
    ys_l = jnp.asarray(np.tile(ys8, N // 8))
    inf = jnp.zeros((N,), bool)
    s = curve.scalar
    k_np = rng.integers(0, 1 << s.limb_bits, (s.n_limbs, N)).astype(np.uint32)
    k_np[-1] = 0
    k_l = jnp.asarray(k_np)

    def host_expect():
        vals = np.zeros(N, object)
        for li in range(s.n_limbs):
            vals += k_np[li].astype(object) << (s.limb_bits * li)
        acc = None
        for i in range(8):
            ktot = int(np.sum(vals[i::8])) % curve.n
            acc = H.aff_add(curve, acc, H.aff_mul(curve, ktot, base[i]))
        return acc

    def run(kernels_on):
        os.environ["TPU_ECC_KERNELS"] = "1" if kernels_on else "0"
        kern = jax.jit(lambda a, b, c, d: P.point_limbs(M.msm_local(
            curve, F.fe_steady(f, a), F.fe_steady(f, b), c, d, terms=T)))
        t0 = time.perf_counter()
        out = np.asarray(kern(xs_l, ys_l, inf, k_l))
        print(f"  kernels={kernels_on}: first call "
              f"{time.perf_counter()-t0:.1f}s")
        best = float("inf")
        kk = k_l
        for _ in range(4):
            kk = jnp.roll(kk, 1, axis=-1)
            np.asarray(kk[0, :1])
            t0 = time.perf_counter()
            o = kern(xs_l, ys_l, inf, kk)
            np.asarray(o[0, :1])
            best = min(best, time.perf_counter() - t0)
        print(f"  kernels={kernels_on}: {best*1e3:.1f} ms  "
              f"{N/best:.3e} points/s")
        return out

    got_k = run(True)
    got_x = run(False)
    assert np.array_equal(got_k, got_x), "kernel Straus != XLA Straus"
    pt = P.point_from_limbs(curve, jnp.asarray(got_k))
    x, y, is_inf = jax.jit(P.to_affine)(pt)
    assert not bool(np.asarray(is_inf))
    want = host_expect()
    assert (F.fe_to_ints(x)[0], F.fe_to_ints(y)[0]) == want, "oracle mismatch"
    print("  correctness OK (kernel == XLA == host oracle)")


if __name__ == "__main__":
    main()
