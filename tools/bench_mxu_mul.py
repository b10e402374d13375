#!/usr/bin/env python3
"""MXU mod-mul experiment (VERDICT r2 item 5; BASELINE north star's
"Montgomery reduction fused into MXU-friendly matmul-style limb products").

The batched data*data limb convolution has no shared operand, so it cannot
ride the MXU (a systolic array contracts against a shared matrix). What IS
matmul-shaped is the *Montgomery reduction*: with R = 2^(b*n),

    m   = (T mod R) * N' mod R      N' = -p^-1 mod R   (constant!)
    out = (T + m*p) / R             p                   (constant!)

Both are constant-by-data banded convolutions: out[k, B] = sum_i C[k, i] *
d[i, B] with C a lower-triangular/banded Toeplitz matrix of the constant's
limbs — an [2n, n] x [n, B] matmul with B as the MXU lane dimension. 13-bit
limbs split into two int8 planes (7 + 6 bits); four int8 x int8 -> int32
plane matmuls recombine exactly as P00 + ((P01 + P10) << 7) + (P11 << 14)
(all bounds < 2^31 for n <= 21).

This tool measures, at B=8192 on the real chip:
  1. fmul via the XLA graph engine (mont CIOS),
  2. fmul via the KFE/Mosaic kernel engine (the production path),
  3. the separated Montgomery mul with the reduction as XLA int8 matmuls,
for p256 (native mont) and a k256 variant forced onto the mont backend
(its production solinas fold is already cheap — the comparison shows what
an MXU Montgomery path could buy if it won). Verdict goes to PERF.md.

    python tools/bench_mxu_mul.py [batch]
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


def _toeplitz(limbs, rows, cols):
    """C[k, i] = limbs[k - i] (0 outside) — the banded conv matrix."""
    m = np.zeros((rows, cols), np.int64)
    for i in range(cols):
        for j, v in enumerate(limbs):
            if i + j < rows:
                m[i + j, i] = v
    return m


def make_mxu_mul(spec):
    """Separated Montgomery mul: VPU conv + MXU-matmul reduction."""
    import jax
    import jax.numpy as jnp
    from tpu_ecc.utils.bigint import int_to_limbs

    b, n, mask = spec.limb_bits, spec.n_limbs, spec.mask
    R = 1 << (b * n)
    n_inv = pow(spec.p, -1, R)
    nprime = (R - n_inv) % R
    np_l = int_to_limbs(nprime, n, b)
    p_l = int_to_limbs(spec.p, n, b)

    def planes(mat):
        lo = (mat & 127).astype(np.int8)
        hi = (mat >> 7).astype(np.int8)
        return jnp.asarray(lo), jnp.asarray(hi)

    # m-matrix: lower-triangular (mod R drops columns >= n)
    M_lo, M_hi = planes(_toeplitz(np_l, n, n))
    # p-matrix: full band to 2n columns
    P_lo, P_hi = planes(_toeplitz(p_l, 2 * n, n))

    def const_conv(Clo, Chi, d):
        """[rows, n] x [n, B] banded conv via 4 int8-plane MXU matmuls."""
        dlo = (d & 127).astype(jnp.int8)
        dhi = (d >> 7).astype(jnp.int8)

        def mm(A, x):
            return jax.lax.dot_general(
                A, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        p00 = mm(Clo, dlo)
        p01 = mm(Clo, dhi)
        p10 = mm(Chi, dlo)
        p11 = mm(Chi, dhi)
        return (p00 + ((p01 + p10) << 7) + (p11 << 14)).astype(jnp.uint32)

    def carry(cols, count):
        out, c = [], None
        for j in range(count):
            t = cols[j] if c is None else cols[j] + c
            out.append(t & np.uint32(mask))
            c = t >> np.uint32(b)
        return jnp.stack(out), c

    def mul(x, y):
        """x, y uint32[n, B] canonical digit arrays -> (x*y*R^-1) digits."""
        # data*data conv (VPU; no shared operand => no MXU shape exists)
        cols = jnp.zeros((2 * n, *x.shape[1:]), jnp.uint32)
        for i in range(n):
            cols = cols.at[i:i + n].add(x[i] * y)
        T, _ = carry(cols, 2 * n)                    # exact digits of x*y
        m = const_conv(M_lo, M_hi, T[:n])            # MXU
        m, _ = carry(m, n)                           # digits of m (mod R)
        u = const_conv(P_lo, P_hi, m)                # MXU: m*p columns
        u = u + T                                    # + T  (< 2^31 per col)
        u, _ = carry(u, 2 * n)
        return u[n:]                                 # (T + m*p)/R < 2p

    return mul


def main():
    import jax
    import jax.numpy as jnp
    from tpu_ecc.curves.specs import get_curve
    from tpu_ecc.ops import fe as F
    from tpu_ecc.ops.fe import make_field_spec

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    print("device:", jax.devices()[0], " B =", B)

    def timeit(name, fn, *args, iters=24):
        out = fn(*args)
        np.asarray(out[0, :1])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            o = None
            for _ in range(iters):
                o = fn(*args)
            np.asarray(o[0, :1])
            best = min(best, (time.perf_counter() - t0) / iters)
        print(f"  {name}: {best*1e6:9.1f} us/call  "
              f"{B/best:.3e} muls/s")
        return best

    k256 = get_curve("secp256k1")
    cases = [
        ("p256 (native mont)", get_curve("p256").field),
        ("k256 forced-mont", make_field_spec("k256mxu.fp", k256.p, "mont")),
        ("k256 solinas (production)", k256.field),
    ]
    rng = np.random.default_rng(1)
    for label, spec in cases:
        print(f"== {label}: n={spec.n_limbs} x {spec.limb_bits}-bit,"
              f" kind={spec.kind}")
        vals = [int.from_bytes(rng.bytes(spec.bits // 8), "big") % spec.p
                for _ in range(B)]
        a = F.fe_from_ints(spec, vals)
        bb = F.fe_from_ints(spec, vals[::-1])

        # 1) XLA graph engine
        xla = jax.jit(lambda u, v: F._steady(F.fmul(
            F.fe_steady(spec, u), F.fe_steady(spec, v))).limbs)
        t_x = timeit("fmul XLA graph   ", xla, a.limbs, bb.limbs)

        # 2) KFE Mosaic kernel engine: a 16-mul chain in ONE kernel, like
        # bench.py's padd chain (amortizes kernel dispatch)
        try:
            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu
            from tpu_ecc.ops import fe_kernel as K
            n = spec.n_limbs
            S = 8
            rows = B // 128

            def body(a_ref, b_ref, o_ref):
                A = K.kfe_from_rows(
                    spec, [a_ref[i, :, :] for i in range(n)])
                Bk = K.kfe_from_rows(
                    spec, [b_ref[i, :, :] for i in range(n)])
                for _ in range(16):
                    A = K.ksteady(K.kmul(A, Bk))
                for i, r in enumerate(A.limbs):
                    o_ref[i, :, :] = r

            sp = pl.BlockSpec((n, S, 128), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)
            kern = pl.pallas_call(
                body, out_shape=jax.ShapeDtypeStruct((n, rows, 128),
                                                     jnp.uint32),
                grid=(rows // S,), in_specs=[sp, sp], out_specs=sp)
            kfe = jax.jit(lambda u, v: kern(
                u.reshape(n, rows, 128),
                v.reshape(n, rows, 128)).reshape(n, B))
            t_k = timeit("fmul KFE kernel  ", kfe, a.limbs, bb.limbs,
                         iters=6)
            print(f"    (per chained mul: {t_k/16*1e6:.1f} us, "
                  f"{16*B/t_k:.3e} muls/s)")
        except Exception as e:
            print(f"  (KFE kernel unavailable: {type(e).__name__}: {e})")

        # 3) separated Montgomery with MXU-matmul reduction (mont only)
        if spec.kind == "mont":
            mxu = make_mxu_mul(spec)
            jmxu = jax.jit(mxu)
            # correctness vs host ints first
            got = np.asarray(jmxu(a.limbs[:, :64], bb.limbs[:, :64]))
            from tpu_ecc.utils.bigint import limbs_np_to_ints
            gi = limbs_np_to_ints(got, spec.limb_bits)
            Rv = 1 << (spec.limb_bits * spec.n_limbs)
            rinv = pow(Rv, -1, spec.p)
            for i in range(64):
                xe = spec.encode_int(vals[i])
                ye = spec.encode_int(vals[B - 1 - i])
                want = (xe * ye * rinv) % spec.p
                assert gi[i] % spec.p == want, (label, i)
            print("    mxu correctness OK (64 host cross-checks)")
            timeit("fmul MXU-mont XLA", jmxu, a.limbs, bb.limbs)

        # 4) round-5 stretch (VERDICT r4 item 9): the int8-plane chain FUSED
        # IN-KERNEL — conv+carry on the VPU in KFE limb-tile form, the two
        # Montgomery matmuls per step on the MXU, operands never leaving
        # VMEM between chain steps. The open question from r3: does keeping
        # the chain in VMEM recover the 4x the separated XLA variant lost?
        if spec.kind == "mont":
            try:
                t_f = bench_mxu_kernel_chain(spec, a, bb, vals, B, timeit)
                print(f"    (per chained mul: {t_f/16*1e6:.1f} us, "
                      f"{16*B/t_f:.3e} muls/s)")
            except Exception as e:
                print(f"  fmul MXU-in-kernel chain: DOES NOT BUILD "
                      f"({type(e).__name__}: {str(e)[:200]})")


def bench_mxu_kernel_chain(spec, a, bb, vals, B, timeit, chain=16):
    """One Pallas kernel running a `chain`-long Montgomery-mul chain where
    each step is VPU conv + carry (KFE list form) and an int8-plane MXU
    reduction (4 dot_generals per const-conv), intermediates in VMEM."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from tpu_ecc.utils.bigint import int_to_limbs, limbs_np_to_ints

    b, n, mask = spec.limb_bits, spec.n_limbs, spec.mask
    R = 1 << (b * n)
    nprime = (R - pow(spec.p, -1, R)) % R
    M_lo_np, M_hi_np = [x for x in _planes_np(_toeplitz(
        int_to_limbs(nprime, n, b), n, n))]
    P_lo_np, P_hi_np = [x for x in _planes_np(_toeplitz(
        int_to_limbs(spec.p, n, b), 2 * n, n))]
    S = 8
    rows = B // 128

    def body(a_ref, b_ref, ml_ref, mh_ref, plo_ref, phi_ref, o_ref):
        xs = [a_ref[i, :, :] for i in range(n)]
        ys = [b_ref[i, :, :] for i in range(n)]

        def carry_list(cols, count):
            out, c = [], None
            for j in range(count):
                t = cols[j] if c is None else cols[j] + c
                out.append(t & np.uint32(mask))
                c = t >> np.uint32(b)
            return out

        def const_conv(Clo, Chi, dlist, out_rows):
            # stack digit tiles [k][S,128] -> [k, S, 128] int8 planes and
            # contract the limb axis on the MXU (4 plane matmuls)
            d = jnp.stack(dlist)                       # [k, S, 128] uint32
            dlo = (d & np.uint32(127)).astype(jnp.int8)
            dhi = (d >> np.uint32(7)).astype(jnp.int8)

            def mm(A, x):
                return jax.lax.dot_general(
                    A, x, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)

            p00 = mm(Clo, dlo)
            p01 = mm(Clo, dhi)
            p10 = mm(Chi, dlo)
            p11 = mm(Chi, dhi)
            u = (p00 + ((p01 + p10) << 7) + (p11 << 14)).astype(jnp.uint32)
            return [u[i] for i in range(out_rows)]

        Ml, Mh = ml_ref[...], mh_ref[...]
        Pl, Ph = plo_ref[...], phi_ref[...]
        for _ in range(chain):
            cols = [None] * (2 * n)
            for i in range(n):
                for j in range(n):
                    pr = xs[i] * ys[j]
                    k = i + j
                    cols[k] = pr if cols[k] is None else cols[k] + pr
            cols[2 * n - 1] = jnp.zeros_like(xs[0])
            T = carry_list(cols, 2 * n)
            m = const_conv(Ml, Mh, T[:n], n)
            m = carry_list(m, n)
            u = const_conv(Pl, Ph, m, 2 * n)
            u = [ui + ti for ui, ti in zip(u, T)]
            u = carry_list(u, 2 * n)
            xs = u[n:]
        for i in range(n):
            o_ref[i, :, :] = xs[i]

    sp = pl.BlockSpec((n, S, 128), lambda i: (0, i, 0),
                      memory_space=pltpu.VMEM)
    cl = lambda r: pl.BlockSpec((r, n), lambda i: (0, 0),  # noqa: E731
                                memory_space=pltpu.VMEM)
    kern = pl.pallas_call(
        body, out_shape=jax.ShapeDtypeStruct((n, rows, 128), jnp.uint32),
        grid=(rows // S,),
        in_specs=[sp, sp, cl(n), cl(n), cl(2 * n), cl(2 * n)],
        out_specs=sp)
    consts = [jnp.asarray(x) for x in (M_lo_np, M_hi_np, P_lo_np, P_hi_np)]
    fused = jax.jit(lambda u, v: kern(
        u.reshape(n, rows, 128), v.reshape(n, rows, 128),
        *consts).reshape(n, B))
    # correctness: chain of 16 Montgomery muls vs host ints
    got = limbs_np_to_ints(np.asarray(fused(a.limbs, bb.limbs))[:, :8], b)
    rinv = pow(R, -1, spec.p)
    for i in range(8):
        xe = spec.encode_int(vals[i])
        ye = spec.encode_int(vals[B - 1 - i])
        want = xe
        for _ in range(chain):
            want = (want * ye * rinv) % spec.p
        assert got[i] % spec.p == want, ("mxu kernel chain", i)
    print("    mxu-in-kernel correctness OK (8 host cross-checks)")
    return timeit("fmul MXU-in-kernel", fused, a.limbs, bb.limbs, iters=6)


def _planes_np(mat):
    lo = (mat & 127).astype(np.int8)
    hi = (mat >> 7).astype(np.int8)
    return lo, hi


if __name__ == "__main__":
    main()
