#!/usr/bin/env python3
"""Ladder-kernel cost attribution on real TPU (VERDICT r2 weak item 1).

Compiles stripped-down variants of the GLV window ladder body and times
each, isolating: the point-formula floor (doubles+adds on scratch), the
in-kernel table build, the constant-time 9-entry select, and the sign
negate — so PERF.md can say where the cycles go instead of guessing.

    python tools/profile_ladder.py [batch]
"""

import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from tpu_ecc.curves.specs import get_curve
    from tpu_ecc.ops import fe_kernel as K
    from tpu_ecc.ops import pallas_kernels as PK
    from tpu_ecc.ops import points as P
    from tpu_ecc.ops import scalarmul as SM
    from tpu_ecc.utils import ec_host as H

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    curve = get_curve("secp256k1")
    f = curve.field
    n = f.n_limbs
    stride = 3 * n
    S = 8
    rows = B // 128
    GL = rows // S
    nw = 34
    TBL = PK.TBL
    kadd = PK._KADD[curve.strategy]
    kdouble = PK._KDOUBLE[curve.strategy]
    print("device:", jax.devices()[0], f" B={B} S={S} nw={nw}")

    G = H.aff_generator(curve)
    rng = np.random.default_rng(11)
    base = [H.aff_mul(curve, int(k), G) for k in rng.integers(1, 2**31, 8)]
    pp = P.from_affine_ints(curve, [p[0] for p in base] * (B // 8),
                            [p[1] for p in base] * (B // 8))
    bases = P.point_limbs(P.steady(pp))[None]
    ks = [int.from_bytes(rng.bytes(32), "big") % curve.n for _ in range(B)]
    k_l = SM.pack_scalars(curve, ks)
    mag, neg = SM.signed_digits(curve, k_l, 132)
    mag = jnp.broadcast_to(mag[:nw, None], (nw, 2, B))
    neg = jnp.broadcast_to(neg[:nw, None], (nw, 2, B)).astype(jnp.uint32)

    def _unflat(rows_):
        return [K.kfe_from_rows(f, list(rows_[c * n:(c + 1) * n]))
                for c in range(3)]

    def _flat(fes):
        return tuple(r for fe in fes for r in fe.limbs)

    def make(variant):
        """Per grid step: 4 dbl + 2 add ladder body with selectable extras."""

        def body(base_ref, mag_ref, neg_ref, o_ref, tbl_ref, acc_ref):
            ci = pl.program_id(1)
            ident = PK._ident_rows(f, (S, 128))

            @pl.when(ci == 0)
            def _init():
                Bse = [K.kfe_from_rows(
                    f, [base_ref[0, c, i, :, :] for i in range(n)])
                    for c in range(3)]
                rows0 = []
                for c in range(3):
                    for i in range(n):
                        tbl_ref[c * n + i] = ident[c][i]
                        tbl_ref[stride + c * n + i] = Bse[c].limbs[i]
                        rows0.append(Bse[c].limbs[i])
                if variant != "bare":      # in-kernel 7-add table build
                    def tstep(k, carry):
                        nxt = [K.ksteady(v)
                               for v in kadd(curve, *_unflat(carry), *Bse)]
                        flat = _flat(nxt)
                        for j, r in enumerate(flat):
                            tbl_ref[k * stride + j] = r
                        return flat

                    jax.lax.fori_loop(2, TBL, tstep, tuple(rows0))
                for c in range(3):
                    for i in range(n):
                        acc_ref[c, i, :, :] = ident[c][i]

            acc = tuple(acc_ref[c, i, :, :]
                        for c in range(3) for i in range(n))

            if variant == "unroll":      # python-unrolled doublings
                for _ in range(4):
                    acc = _flat([K.ksteady(v)
                                 for v in kdouble(curve, *_unflat(acc))])
            else:
                def dstep(_, carry):
                    return _flat([K.ksteady(v)
                                  for v in kdouble(curve, *_unflat(carry))])

                acc = jax.lax.fori_loop(0, 4, dstep, acc)

            for h in range(2):
                if variant in ("bare", "build", "unroll"):
                    sel = tuple(tbl_ref[stride + j] for j in range(stride))
                else:
                    mg = mag_ref[0, h, :, :]

                    def sel_step(k, sel, mg=mg):
                        m = mg == k.astype(jnp.uint32)
                        return tuple(jnp.where(m, tbl_ref[k * stride + j],
                                               sel[j])
                                     for j in range(stride))

                    sel = jax.lax.fori_loop(
                        0, TBL, sel_step,
                        tuple(r for cc in ident for r in cc))
                X, Y, Z = _unflat(sel)
                if variant == "negate":
                    negm = neg_ref[0, h, :, :] != 0
                    Yn = K.ksteady(K.kneg(Y))
                    Y = K.kfe_from_rows(
                        f, [jnp.where(negm, a, b)
                            for a, b in zip(Yn.limbs, Y.limbs)])
                acc = _flat([K.ksteady(v)
                             for v in kadd(curve, *_unflat(acc), X, Y, Z)])

            for c in range(3):
                for i in range(n):
                    acc_ref[c, i, :, :] = acc[c * n + i]

            @pl.when(ci == nw - 1)
            def _fin():
                for c in range(3):
                    for i in range(n):
                        o_ref[c, i, :, :] = acc[c * n + i]

        bv = pl.BlockSpec((1, 3, n, S, 128), lambda l, c: (0, 0, 0, l, 0),
                          memory_space=pltpu.VMEM)
        dv = pl.BlockSpec((1, 2, S, 128), lambda l, c: (c, 0, l, 0),
                          memory_space=pltpu.VMEM)
        ov = pl.BlockSpec((3, n, S, 128), lambda l, c: (0, 0, l, 0),
                          memory_space=pltpu.VMEM)

        @jax.jit
        def run(bases, mag, neg):
            out = pl.pallas_call(
                body,
                out_shape=jax.ShapeDtypeStruct((3, n, rows, 128), jnp.uint32),
                grid=(GL, nw),
                in_specs=[bv, dv, dv],
                out_specs=ov,
                scratch_shapes=[
                    pltpu.VMEM((TBL * stride, S, 128), jnp.uint32),
                    pltpu.VMEM((3, n, S, 128), jnp.uint32)],
            )(bases.reshape(1, 3, n, rows, 128),
              mag.reshape(nw, 2, rows, 128), neg.reshape(nw, 2, rows, 128))
            return out.reshape(3, n, B)

        return run

    def timeit(name, fn, *args, iters=8):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out[0, 0, :1])
        print(f"  {name}: first call {time.perf_counter()-t0:.1f}s")
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(out[0, 0, :1])
            best = min(best, time.perf_counter() - t0)
        per_win = best / (GL * nw) * 1e6
        print(f"  {name}: {best*1e3:7.2f} ms   {per_win:6.1f} us/window-block")
        return best

    # reference: the fused padd chain at the SAME block (S=8): the
    # known-fast shape (PERF.md 2.47e8 adds/s was measured at S=16)
    a_l = P.point_limbs(P.steady(pp))
    ch = PK.padd_chain_call(curve, B, 1024, 16)
    tc = timeit("padd16 S=8 chain", lambda a, b: ch(a, b), a_l, a_l)
    print(f"    per add-block: {tc/(16*GL)*1e6:6.1f} us")
    ch2 = PK.padd_chain_call(curve, B, 2048, 16)
    tc2 = timeit("padd16 S=16 chain", lambda a, b: ch2(a, b), a_l, a_l)
    print(f"    per add-block: {tc2/(16*GL//2)*1e6:6.1f} us")

    prev = 0.0
    for variant in ("bare", "unroll", "build", "select", "negate"):
        t = timeit(f"{variant:7s}", make(variant), bases, mag, neg)
        if prev:
            print(f"    delta vs previous: {(t-prev)*1e3:+7.2f} ms")
        prev = t


if __name__ == "__main__":
    main()
