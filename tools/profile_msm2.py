#!/usr/bin/env python3
"""Follow-up MSM phase experiments (see tools/profile_msm.py for phase 1):

  horner      window-combine kernel cost (fixed-shape repro)
  gather64/128  payload row gather with rows padded to 64/128 lanes
  gfused      gather fused with the chunk transpose (single jit)
  blookup2    bucket lookup via one scanned transpose + flat ROW gathers
              (vs the minor-axis 2-D gather: 5.5 ms/window)

    python tools/profile_msm2.py [log2_N]
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
    import jax.numpy as jnp

    from tpu_ecc.curves.specs import get_curve
    from tpu_ecc.ops import pallas_kernels as PK
    from tpu_ecc.ops import points as P
    from tpu_ecc.utils.profiling import time_fn

    logN = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    N, w, L = 1 << logN, 13, 8192
    C = N // L
    nbuck = 1 << w
    curve = get_curve("secp256k1")
    f, s = curve.field, curve.scalar
    n = f.n_limbs
    print(f"device: {jax.devices()[0].device_kind}  N=2^{logN} w={w} L={L}")
    rng = np.random.default_rng(7)

    nochain = lambda out, a: a  # noqa: E731

    def t(name, fn, *args, iters=16):
        jfn = jax.jit(fn)
        per = time_fn(jfn, *args, iters=iters, chain=nochain)
        print(f"  {name:10s} {per*1e3:8.3f} ms")
        return jfn(*args)

    # --- horner kernel, standalone ---
    ident1 = P.point_limbs(P.identity(curve))          # [3, n]
    nw = -(-s.bits // w)
    s_b = jnp.broadcast_to(
        jnp.asarray(np.asarray(ident1))[None, :, :, None, None],
        (nw, 3, n, 8, 128))
    hor = PK.horner_call(curve, w, nw)
    t("horner", lambda x: hor(x), s_b, iters=8)

    # --- gather layout experiments ---
    order = jnp.asarray(rng.permutation(N).astype(np.int32))
    pl60 = jnp.asarray(rng.integers(0, 1 << 13, (N, 3 * n), np.int64)
                       .astype(np.uint32))
    t("gather60", lambda o, p: jnp.take(p, o, axis=0), order, pl60)
    pl64 = jnp.asarray(rng.integers(0, 1 << 13, (N, 64), np.int64)
                       .astype(np.uint32))
    t("gather64", lambda o, p: jnp.take(p, o, axis=0), order, pl64)
    pl128 = jnp.asarray(rng.integers(0, 1 << 13, (N, 128), np.int64)
                        .astype(np.uint32))
    t("gather128", lambda o, p: jnp.take(p, o, axis=0), order, pl128)

    def gfused(o, p):
        sm = jnp.take(p, o, axis=0)
        return jax.lax.optimization_barrier(
            jnp.moveaxis(sm.reshape(L, C, 3 * n), 0, -1).reshape(C, 3, n, L))

    t("gfused", gfused, order, pl60)

    # gather straight into lane-chunk order: row r of the output is point
    # order[(r % L) * C + r // L] — same bytes, different write pattern;
    # output rows are already [C, L] raster so chunk becomes a pure reshape
    perm = jnp.asarray(
        (np.arange(N, dtype=np.int64).reshape(C, L).T.reshape(-1)))

    def gdirect(o, p):
        o2 = jnp.take(o, perm)           # tiny int gather
        sm = jnp.take(p, o2, axis=0)     # [L*C, 3n] lane-major rows
        return jax.lax.optimization_barrier(
            jnp.moveaxis(sm.reshape(L, C, 3 * n), 0, -1).reshape(C, 3, n, L))

    t("gdirect", gdirect, order, pl60)

    # --- bucket lookup via flat row gathers ---
    scanned = jnp.asarray(rng.integers(0, 1 << 13, (C, 3, n, L), np.int64)
                          .astype(np.uint32))
    skey = jnp.sort(jnp.asarray(
        rng.integers(0, nbuck, N, np.int64).astype(np.uint32)))
    first_key = skey.reshape(L, C).T[0]
    fixed = jnp.asarray(rng.integers(0, 1 << 13, (3, n, L), np.int64)
                        .astype(np.uint32))

    def blookup_old(sk, scn, fx):
        bids = jnp.arange(nbuck, dtype=jnp.uint32)
        bidx = jnp.searchsorted(sk, bids, side="right").astype(jnp.int32) - 1
        safe = jnp.maximum(bidx, 0)
        have = (bidx >= 0) & (jnp.take(sk, safe) == bids)
        lane = safe // C
        pos = safe % C
        end_vals = scn[pos, :, :, lane]
        spans = jnp.take(first_key, lane) == bids
        span_vals = jnp.moveaxis(fx, -1, 0)[lane]
        ident_b = jnp.broadcast_to(ident1[None], (nbuck, 3, n))
        bv = jnp.where(spans[:, None, None] & have[:, None, None], span_vals,
                       jnp.where(have[:, None, None], end_vals, ident_b))
        return jnp.moveaxis(bv, 0, -1)

    t("blookup", blookup_old, skey, scanned, fixed)

    def blookup_new(sk, scn, fx):
        bids = jnp.arange(nbuck, dtype=jnp.uint32)
        bidx = jnp.searchsorted(sk, bids, side="right").astype(jnp.int32) - 1
        safe = jnp.maximum(bidx, 0)
        have = (bidx >= 0) & (jnp.take(sk, safe) == bids)
        lane = safe // C
        pos = safe % C
        scn_rows = jax.lax.optimization_barrier(
            jnp.moveaxis(scn.reshape(C, 3 * n, L), -1, 1)
            .reshape(C * L, 3 * n))                     # row r = (pos, lane)
        end_vals = jnp.take(scn_rows, pos * L + lane,
                            axis=0).reshape(nbuck, 3, n)
        spans = jnp.take(first_key, lane) == bids
        span_vals = jnp.take(
            jnp.moveaxis(fx.reshape(3 * n, L), -1, 0), lane,
            axis=0).reshape(nbuck, 3, n)
        ident_b = jnp.broadcast_to(ident1[None], (nbuck, 3, n))
        bv = jnp.where(spans[:, None, None] & have[:, None, None], span_vals,
                       jnp.where(have[:, None, None], end_vals, ident_b))
        return jnp.moveaxis(bv, 0, -1)

    out_new = t("blookup2", blookup_new, skey, scanned, fixed)
    out_old = jax.jit(blookup_old)(skey, scanned, fixed)
    print("  blookup2 == blookup:",
          bool(jnp.array_equal(out_new, out_old)))


if __name__ == "__main__":
    main()
