#!/usr/bin/env python3
"""Pallas (Mosaic) vs XLA point-add on the real chip — the round-2 judgment
run for the kernel layer (VERDICT item 4). Run with the default (TPU) env:
    python tools/bench_pallas.py [batch] [block]
Prints adds/s for both paths and the ratio; updates nothing by itself —
paste results into PERF.md."""

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
    from tpu_ecc.ops import pallas_kernels as PK
    from tpu_ecc.utils import ec_host as H

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    REPEAT, ITERS = 16, 32
    curve = get_curve("secp256k1")
    print("device:", jax.devices()[0])

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

    import jax.numpy as jnp

    def fetch(arr):
        # REAL D2H read: block_until_ready can return early via the tunnel
        return np.asarray(arr[0, 0, :1])

    def measure(tag, fn):
        out = fn(a_l, b_l)
        fetch(out)
        # chain-length differencing: fetch latency + dispatch ramp cancel
        best = 0.0
        for _ in range(3):
            def run(count, o):
                t0 = time.perf_counter()
                for _ in range(count):
                    o = fn(o, b_l)
                fetch(o)
                return time.perf_counter() - t0, o
            t1, out = run(ITERS // 4, out)
            t2, out = run(ITERS + ITERS // 4, out)
            if t2 > t1:
                best = max(best, ITERS * REPEAT * B / (t2 - t1))
        print(f"{tag:8s} {best:.3e} adds/s")
        return best, out

    @jax.jit
    def xla_chain(a, b):
        pa = P.point_from_limbs(curve, a)
        pb = P.point_from_limbs(curve, b)
        for _ in range(REPEAT):
            pa = P.steady(P.padd(pa, pb))
        return P.point_limbs(pa)

    # REPEAT chained adds inside ONE kernel: intermediates never leave VMEM —
    # the fused-VMEM design point the XLA path cannot express.
    pallas_fused = PK.padd_chain_call(curve, B, block, REPEAT)

    def pallas_percall(a, b):
        pa = P.point_from_limbs(curve, a)
        pb = P.point_from_limbs(curve, b)
        for _ in range(REPEAT):
            pa = PK.padd_pallas(pa, pb, block=block)
        return P.point_limbs(pa)

    r_x, out_x = measure("xla", xla_chain)
    r_pf, out_pf = measure("pallas-f", pallas_fused)
    assert np.array_equal(np.asarray(out_x), np.asarray(out_pf)), \
        "pallas fused result != xla result"
    r_pp, out_pp = measure("pallas-1", pallas_percall)
    assert np.array_equal(np.asarray(out_x), np.asarray(out_pp))
    print(f"ratio fused/xla = {r_pf / r_x:.3f}, percall/xla = {r_pp / r_x:.3f}")


if __name__ == "__main__":
    main()
