#!/usr/bin/env python3
"""Measure field_mul vs field_square on the real chip (VERDICT r2 item 9:
BENCHES.json recorded square ~3x SLOWER than mul on every curve, which is
wrong on its face — a symmetric square does ~half the multiplies).

    python tools/bench_sq.py [batch] [curves...]
"""

import os
import sys

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
    from tpu_ecc.ops import fe as F
    from tpu_ecc.utils.profiling import time_fn

    args = sys.argv[1:]
    B = int(args.pop(0)) if args and args[0].isdigit() else 8192
    names = args or ["secp256k1", "p256", "p384"]
    print(f"device: {jax.devices()[0].device_kind}  B = {B}")
    rng = np.random.default_rng(1)
    for cn in names:
        f = get_curve(cn).field
        vals = [int.from_bytes(rng.bytes(f.bits // 8), "big") % f.p
                for _ in range(8)] * (B // 8)
        a_l = F.fe_from_ints(f, vals).limbs
        b_l = F.fe_from_ints(f, vals[::-1]).limbs

        def wrap(op):
            def fn(*ls):
                fes = [F.fe_steady(f, l) for l in ls]
                return F._steady(op(*fes)).limbs
            return jax.jit(fn)

        tm = time_fn(wrap(F.fmul), a_l, b_l, iters=192)
        ts = time_fn(wrap(F.fsquare), a_l, iters=192)
        print(f"== {cn} (n={f.n_limbs}, {f.kind}, symmetric="
              f"{f.sq_symmetric})")
        print(f"  mul    {tm*1e6:9.1f} us/call  {B/tm:.3e}/s")
        print(f"  square {ts*1e6:9.1f} us/call  {B/ts:.3e}/s  "
              f"(ratio sq/mul = {ts/tm:.2f})")


if __name__ == "__main__":
    main()
