#!/usr/bin/env python3
"""TPU verification + bench for the fused comb fixed-base kernel
(ops/pallas_kernels.genmul_call): asserts bit-equality of mul_by_generator
against the XLA mixed-add scan path, then measures both, plus the full
ECDSA sign/verify device cores with kernels on.

    python tools/bench_genmul.py [batch] [curves...]

A non-numeric first argument is treated as a curve name (batch stays 4096).
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
    from tpu_ecc.curves.specs import get_curve
    from tpu_ecc.ops import points as P
    from tpu_ecc.ops import scalarmul as SM

    args = sys.argv[1:]
    B = 4096
    if args and args[0].isdigit():
        B = int(args.pop(0))
    print("device:", jax.devices()[0], " B =", B)

    def fetch(a):
        return np.asarray(a[0, 0, :1])

    def timeit(name, fn, *args, iters=6):
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

    names = args or ("secp256k1", "p192")
    for name in names:
        curve = get_curve(name)
        rng = np.random.default_rng(13)
        ks = [int.from_bytes(rng.bytes(32), "big") % curve.n for _ in range(B)]
        k_l = SM.pack_scalars(curve, ks)

        def make(tag):
            @jax.jit
            def gm(kl):
                return P.point_limbs(P.steady(SM.mul_by_generator(curve, kl)))
            return gm

        os.environ["TPU_ECC_KERNELS"] = "0"
        gm_x = make("xla")
        out_x = timeit(f"{name} genmul xla ", gm_x, k_l, iters=3)
        os.environ["TPU_ECC_KERNELS"] = "1"
        gm_k = make("kern")
        out_k = timeit(f"{name} genmul kern", gm_k, k_l)
        assert np.array_equal(np.asarray(out_x), np.asarray(out_k)), \
            f"{name} genmul kernel != xla"
        print(f"  {name} bit-equality OK")


if __name__ == "__main__":
    main()
