#!/usr/bin/env python3
"""TPU verification + bench for the fused Straus ladder kernel
(ops/pallas_kernels.ladder_call): asserts bit-equality of scalar_mul and
2-term lincomb against the XLA scan path, then measures both.

Two numbers per op: per-call (one dispatch + fetch through the ~25-30ms
axon tunnel — the single-caller latency) and MARGINAL via chain-length
differencing (dependency-chained calls, one fetch closing the window — the
pipelined-service throughput; the tunnel latency cancels). Round-2 recorded
only the former, which under-reported the kernels ~10x (PERF.md round-3
methodology note).

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
    import jax.numpy as jnp  # noqa: F401
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
        # marginal rate: the first argument chains through the output point
        marg = float("inf")
        o = out
        for _ in range(3):
            def run(count, o):
                t0 = time.perf_counter()
                for _ in range(count):
                    o = fn(o, *args[1:])
                fetch(o)
                return time.perf_counter() - t0, o
            t1, o = run(3, o)
            t2, o = run(13, o)
            if t2 > t1:
                marg = min(marg, (t2 - t1) / 10)
        print(f"  {name}: {best*1e3:.2f} ms/call  {B/best:.3e} /s   "
              f"marginal {marg*1e3:.2f} ms  {B/marg:.3e} /s")
        return out

    def affine(limbs):
        from tpu_ecc.ops import fe as F
        x, y, inf = jax.jit(P.to_affine)(
            P.point_from_limbs(curve, jnp.asarray(np.asarray(limbs))))
        return (F.fe_to_ints(x), F.fe_to_ints(y), np.asarray(inf).tolist())

    glv = "1" if curve.glv else "0"
    # plain signed ladder (GLV off): kernel must be bit-equal to XLA
    os.environ["TPU_ECC_GLV"] = "0"
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
    print("  bit-equality OK (plain signed ladder)")

    if curve.glv:
        # GLV path: shared-table endo kernel vs the XLA pre-transform
        # fallback are different computation orders — compare affine points
        os.environ["TPU_ECC_GLV"] = "1"
        os.environ["TPU_ECC_KERNELS"] = "0"
        smul_xg, lin_xg = make_fns("xla-glv")
        out_sxg = timeit("scalar_mul xla  glv", smul_xg, p_l, k_l, iters=3)
        out_lxg = timeit("lincomb2   xla  glv", lin_xg, p_l, k_l, k2_l,
                         iters=3)
        os.environ["TPU_ECC_KERNELS"] = "1"
        smul_kg, lin_kg = make_fns("kern-glv")
        out_skg = timeit("scalar_mul kern glv", smul_kg, p_l, k_l)
        out_lkg = timeit("lincomb2   kern glv", lin_kg, p_l, k_l, k2_l)
        assert affine(out_sxg) == affine(out_skg) == affine(out_sk), \
            "glv scalar_mul mismatch"
        assert affine(out_lxg) == affine(out_lkg) == affine(out_lk), \
            "glv lincomb mismatch"
        print("  affine-equality OK (GLV kernel vs XLA vs plain)")
    os.environ["TPU_ECC_GLV"] = glv


if __name__ == "__main__":
    main()
