#!/usr/bin/env python3
"""TPU verification + bench for the fused Straus ladder kernel
(ops/pallas_kernels.ladder_call): asserts bit-equality of scalar_mul and
2-term lincomb against the XLA scan path, then measures both.

    python tools/bench_ladder.py [batch]
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
    from tpu_ecc.ops import points as P
    from tpu_ecc.ops import scalarmul as SM
    from tpu_ecc.utils import ec_host as H

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    curve = get_curve(sys.argv[2] if len(sys.argv) > 2 else "secp256k1")
    print("device:", jax.devices()[0], " B =", B, " curve =", curve.name)

    G = H.aff_generator(curve)
    rng = np.random.default_rng(11)
    base = [H.aff_mul(curve, int(k), G) for k in rng.integers(1, 2**31, 8)]
    pp = P.from_affine_ints(curve, [p[0] for p in base] * (B // 8),
                            [p[1] for p in base] * (B // 8))
    p_l = P.point_limbs(pp)
    ks = [int.from_bytes(rng.bytes(32), "big") % curve.n for _ in range(B)]
    k_l = SM.pack_scalars(curve, ks)
    k2_l = SM.pack_scalars(curve, [k + 7 for k in ks])

    def make_fns(tag):
        @jax.jit
        def smul(pl_, kl):
            return P.point_limbs(P.steady(
                SM.scalar_mul(P.point_from_limbs(curve, pl_), kl)))

        @jax.jit
        def lin(pl_, k1, k2):
            Q = P.point_from_limbs(curve, pl_)
            Gb = P.generator(curve, Q.batch_shape)
            return P.point_limbs(P.steady(SM.lincomb([(Gb, k1), (Q, k2)])))

        return smul, lin

    def fetch(a):
        return np.asarray(a[0, 0, :1])

    def timeit(name, fn, *args, iters=8):
        t0 = time.perf_counter()
        out = fn(*args)
        fetch(out)
        print(f"  {name}: first call {time.perf_counter()-t0:.1f}s")
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            fetch(out)
            best = min(best, time.perf_counter() - t0)
        print(f"  {name}: {best*1e3:.2f} ms  {B/best:.3e} /s")
        return out

    os.environ["TPU_ECC_KERNELS"] = "0"
    smul_x, lin_x = make_fns("xla")
    out_sx = timeit("scalar_mul xla   ", smul_x, p_l, k_l, iters=3)
    out_lx = timeit("lincomb2   xla   ", lin_x, p_l, k_l, k2_l, iters=3)

    os.environ["TPU_ECC_KERNELS"] = "1"
    smul_k, lin_k = make_fns("kern")
    out_sk = timeit("scalar_mul kernel", smul_k, p_l, k_l)
    out_lk = timeit("lincomb2   kernel", lin_k, p_l, k_l, k2_l)

    assert np.array_equal(np.asarray(out_sx), np.asarray(out_sk)), \
        "scalar_mul kernel != xla"
    assert np.array_equal(np.asarray(out_lx), np.asarray(out_lk)), \
        "lincomb kernel != xla"
    print("  bit-equality OK")


if __name__ == "__main__":
    main()
