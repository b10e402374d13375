#!/usr/bin/env python3
"""Headline benchmark: batched secp256k1 point additions per second per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 1e8 point-adds/s/chip (BASELINE.md north star).
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")


def main():
    import jax

    from tpu_ecc.curves.specs import get_curve
    from tpu_ecc.ops import points as P
    from tpu_ecc.utils import ec_host as H

    curve = get_curve("secp256k1")
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    REPEAT = 16  # chained adds inside one jit to amortize dispatch

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
        for _ in range(REPEAT):
            pa = P.steady(P.padd(pa, pb))
        return P.point_limbs(pa)

    out = chain(a_l, b_l)
    out.block_until_ready()  # compile + warmup

    # fixed-count dependent chain: each call consumes the previous output, so
    # the measurement is pure device execution time (no pipelining artifacts)
    iters = 64
    t0 = time.perf_counter()
    for _ in range(iters):
        out = chain(out, b_l)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    adds_per_sec = iters * REPEAT * B / dt
    print(json.dumps({
        "metric": "secp256k1 batched point-adds/s/chip",
        "value": round(adds_per_sec, 1),
        "unit": "adds/s",
        "vs_baseline": round(adds_per_sec / 1e8, 4),
    }))


if __name__ == "__main__":
    main()
