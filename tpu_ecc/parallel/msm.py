"""Multi-scalar multiplication (MSM): single-device kernels + mesh sharding.

The reference has no MSM beyond slice lincomb (k256/src/arithmetic/mul.rs:326-340);
this subsystem is new, designed TPU-first (SURVEY.md §2.8). Two kernels behind
one `msm()` entry:

- *Straus* (small N): chunked shared-doubling lincomb. Points are processed in
  groups of T terms x B lanes; each group runs a windowed lincomb whose
  doublings are shared across the T terms; lane partials fold in one
  log-depth tree. ~96 element point-ops/point at T=8.
- *Pippenger* (large N): sorted/bucketed, restructured for SIMD lanes. Per
  w-bit window: sort points by digit (uint32 key sort + one gather), then a
  *chunked segmented scan* — each of L lanes serially accumulates a C=N/L
  contiguous run of sorted points (1 element-add per point), with a log(L)
  Hillis–Steele fix-up stitching runs that cross lane boundaries — then a
  per-bucket run-end LOOKUP (binary search on the sorted keys + one
  nbuck-row gather; cheaper than scattering N rows) fills the 2^w bucket
  array, reduced by a suffix scan + tree sum (sum_b b*S_b = sum suffix_b)
  and one Horner combine across windows. On TPU every phase after the sort
  runs as a fused Mosaic kernel (segscan/fixup/bucket/horner — grid-stepped
  bodies, pallas_kernels.py).
  ~(ceil(bits/w) * (1 + eps)) element point-ops/point: ~21/pt for 256-bit
  scalars at w=13 vs Straus's ~96/pt. Every step is full-width, log-depth,
  and data-independent in *timing* (the sort permutation depends on scalar
  digits; use Straus for secret scalars — Pippenger's domain is public-input
  aggregation, where vartime is the reference convention too).

Multi-device: the point axis is sharded over a mesh axis via jax.shard_map;
each device computes its shard's partial MSM; the tiny per-device partials
travel over ICI via one all_gather and every device folds them with the same
log-depth tree (EC addition is not an arithmetic psum). Compile-time
discipline: every repeated point-op lives inside a lax.scan body, so the
traced program holds ~8 addition formulas total regardless of N or mesh size.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as PS

from ..curves.specs import CurveSpec
from ..ops import fe as F
from ..ops import points as P
from ..ops import scalarmul as SM
from ..ops.fe import U32
from ..ops.points import Point



# Axes of the enclosing shard_map, set by msm_sharded.local so the scan
# initializers below (identity-point constants) can be promoted to
# device-varying values — lax.scan requires carry-in and carry-out to agree
# in varying-manual-axes type now that check_vma stays enabled.
_VMA_AXES: tuple = ()


def _as_varying(x):
    if _VMA_AXES:
        return jax.lax.pcast(x, _VMA_AXES, to="varying")
    return x


def tree_reduce_points(pt: Point) -> Point:
    """Fold the last batch axis of a point batch into one point.

    Hillis–Steele all-reduce: log2(B) rounds of `acc += roll(acc, -2^k)`
    (one padd per scan step — a single traced addition formula regardless of
    B). After the last round every lane holds the total; lane 0 is returned.
    The batch size must be a power of two; padding lanes hold the identity.
    """
    c = pt.curve
    B = pt.batch_shape[-1]
    assert B & (B - 1) == 0, "tree_reduce needs power-of-two lanes"
    limbs = P.point_limbs(P.steady(pt))
    if B > 1:
        shifts = jnp.asarray([1 << i for i in range(B.bit_length() - 1)],
                             jnp.int32)

        def step(acc, s):
            rolled = jnp.roll(acc, -s, axis=-1)
            tot = P.padd(P.point_from_limbs(c, acc),
                         P.point_from_limbs(c, rolled))
            return P.point_limbs(P.steady(tot)), None

        limbs, _ = jax.lax.scan(step, limbs, shifts)
    return P.point_from_limbs(c, limbs[..., 0])


# ---------------------------------------------------------------------------
# Straus kernel (small N / secret scalars): shared-doubling chunked lincomb
# ---------------------------------------------------------------------------

def msm_local(curve: CurveSpec, xs, ys, inf_mask, k_limbs, terms: int = 8,
              scalar_bits=None) -> Point:
    """Straus MSM over one device's points -> single point (batch ()).

    xs/ys: FE with batch [N]; inf_mask: bool[N] identity markers (padding);
    k_limbs: uint32[ns, N] canonical scalars. N must be divisible by
    terms * lanes; the caller pads with identity + zero scalars.
    """
    return tree_reduce_points(
        msm_local_lanes(curve, xs, ys, inf_mask, k_limbs, terms, scalar_bits))


def msm_local_lanes(curve: CurveSpec, xs, ys, inf_mask, k_limbs,
                    terms: int = 8, scalar_bits=None) -> Point:
    """Straus MSM partials: per-lane sums, batch [lanes] (un-reduced)."""
    N = xs.batch_shape[0]
    lanes = _pick_lanes(N, terms)
    G = N // (terms * lanes)
    shape = (G, terms, lanes)

    def reshape_fe(fe):
        return F.FE(fe.limbs.reshape(fe.limbs.shape[:-1] + shape),
                    fe.spec, fe.bound, fe.vmax)

    xs_r, ys_r = reshape_fe(xs), reshape_fe(ys)
    inf_r = inf_mask.reshape(shape)
    k_r = k_limbs.reshape(k_limbs.shape[:-1] + shape)

    def group(g, acc_l):
        idx = lambda fe: F.FE(fe.limbs[:, g], fe.spec, fe.bound, fe.vmax)  # noqa: E731
        pts = P.from_affine(curve, idx(xs_r), idx(ys_r), inf_r[g])
        partial = _lincomb_terms(curve, pts, k_r[:, g], terms, scalar_bits)
        acc = P.point_from_limbs(curve, acc_l)
        return P.point_limbs(P.steady(P.padd(acc, partial)))

    acc0 = _as_varying(P.point_limbs(P.identity(curve, (lanes,))))
    acc_l = jax.lax.fori_loop(0, G, group, acc0) if G > 1 else group(0, acc0)
    return P.point_from_limbs(curve, acc_l)


def _pick_lanes(N, terms):
    per = N // terms
    lanes = per & (-per)          # largest power-of-two divisor
    lanes = min(lanes, 4096)
    assert N % (terms * lanes) == 0, (N, terms, lanes)
    return lanes


def _lincomb_terms(curve: CurveSpec, pts: Point, k_limbs, terms: int,
                   scalar_bits=None) -> Point:
    """lincomb over the `terms` axis with lanes batch: pts batch [T, B],
    k_limbs [ns, T, B] -> Point batch [B]. One stacked table build (a single
    scan over the whole [T, B] batch) + a window scan whose body folds the T
    term lookups with a log2(T) tree.

    On TPU the group routes through scalarmul.lincomb_auto instead — the
    fused signed-digit ladder kernel (+ GLV split on k256), the same engine
    as the protocol verify cores. The stacked-table scan below stays the
    portable path: its jaxpr holds ONE table build regardless of T, which
    is what keeps the XLA:CPU test/dryrun compiles tractable."""
    assert terms & (terms - 1) == 0, "terms must be a power of two"
    B = pts.batch_shape[-1]
    if SM._ladder_kernel_ok(curve, (B,), terms):
        pl = P.point_limbs(pts)                        # [3, n, T, B]
        tlist = [(P.point_from_limbs(curve, pl[:, :, t]), k_limbs[:, t])
                 for t in range(terms)]
        return SM.lincomb_auto(tlist, scalar_bits)
    tbl = SM._point_table(pts)                         # [16, 3, n, T, B]
    digss = SM.window_digits(curve, k_limbs, scalar_bits)   # [nw, T, B]

    def body(acc_l, digs):
        acc = P.point_from_limbs(curve, acc_l)
        for _ in range(4):
            acc = P.steady(P.pdouble(acc))
        term_l = SM._ct_lookup(tbl, digs)              # [3, n, T, B]
        t = terms
        while t > 1:                                   # log2(T) tree fold
            t //= 2
            s = P.padd(P.point_from_limbs(curve, term_l[..., :t, :]),
                       P.point_from_limbs(curve, term_l[..., t:, :]))
            term_l = P.point_limbs(P.steady(s))
        acc = P.steady(P.padd(acc, P.point_from_limbs(curve, term_l[..., 0, :])))
        return P.point_limbs(acc), None

    acc0 = _as_varying(P.point_limbs(P.identity(curve, pts.batch_shape[1:])))
    acc_l, _ = jax.lax.scan(body, acc0, digss)
    return P.point_from_limbs(curve, acc_l)


# ---------------------------------------------------------------------------
# Pippenger kernel (large N): sort + chunked segmented scan + buckets
# ---------------------------------------------------------------------------

def wide_window_digits(curve: CurveSpec, k_limbs: jax.Array, w: int,
                       scalar_bits=None) -> jax.Array:
    """w-bit windows of canonical scalar limbs, MSB window first ->
    uint32[nw, *batch] (the w-generalization of SM.window_digits)."""
    s = curve.scalar
    b = s.limb_bits
    assert 1 <= w <= 16
    bits = scalar_bits or s.bits
    nw = -(-bits // w)
    mask = np.uint32((1 << w) - 1)
    digs = []
    for j in range(nw):
        lo = w * j
        acc = None
        for li in range(lo // b, min(s.n_limbs - 1, (lo + w - 1) // b) + 1):
            base = b * li
            if base >= lo:
                t = k_limbs[li] << np.uint32(base - lo)
            else:
                t = k_limbs[li] >> np.uint32(lo - base)
            acc = t if acc is None else acc | t
        digs.append(acc & mask)
    return jnp.stack(digs[::-1], axis=0)  # MSB first


def wide_window_digits_signed(curve: CurveSpec, k_limbs: jax.Array, w: int,
                              scalar_bits=None):
    """Signed w-bit window recoding for Pippenger: digits in
    [-2^(w-1), 2^(w-1)], so the bucket space HALVES (nbuck = 2^(w-1)) and a
    256-bit scalar needs ceil(257/w) windows instead of ceil(256/(w-1))-ish
    unsigned ones at the same bucket count — one fewer full sort+gather pass
    at w=14 (PERF.md round-3 "next levers").

    Returns (keys, negs), MSB window first:
      keys uint32[nw', N]: |digit| - 1, or the sentinel nbuck for digit 0
        (sorts after every real bucket; no bucket reads it)
      negs bool[nw', N]: digit < 0 (the caller adds -P into bucket |d|-1)
    The bucket weight is therefore (key + 1) — sum of ALL suffix sums, no
    dropped zero bucket. If the top window can carry out (bits % w == 0), an
    extra MSB row with digit = carry (0/1) is appended (nw' = nw + 1).
    """
    s = curve.scalar
    bits = scalar_bits or s.bits
    digs = wide_window_digits(curve, k_limbs, w, scalar_bits)[::-1]  # LSB 1st
    nw = digs.shape[0]
    half = np.uint32(1 << (w - 1))
    full = np.uint32(1 << w)
    sentinel = half  # == nbuck
    keys, negs = [], []
    carry = jnp.zeros(digs.shape[1:], U32)
    for j in range(nw):
        t = digs[j] + carry                       # <= 2^w (no uint32 wrap)
        carry = (t > half).astype(U32)
        mag = jnp.where(carry == 1, full - t, t)  # |signed digit| <= 2^(w-1)
        keys.append(jnp.where(mag == 0, sentinel, mag - 1))
        negs.append(jnp.logical_and(carry == 1, mag != 0))
    top_bits = bits - w * (nw - 1)
    if top_bits == w:                             # top window can carry out
        keys.append(jnp.where(carry == 1, np.uint32(0), sentinel))
        negs.append(jnp.zeros_like(negs[0]))
    return (jnp.stack(keys[::-1], axis=0),        # MSB first
            jnp.stack(negs[::-1], axis=0))


def _hs_scan(curve: CurveSpec, limbs: jax.Array, nsteps: int, mode: str,
             unroll: int = 1):
    """Hillis–Steele point scan over the last axis (width W = 2^nsteps).

    mode 'suffix': out[i] = sum_{j >= i} in[j]   (guarded, no wraparound)
    mode 'total':  every lane = sum of all lanes (wraparound all-reduce)
    One padd per scan step -> one traced addition formula.
    """
    W = limbs.shape[-1]
    idx = jnp.arange(W, dtype=jnp.int32)
    shifts = jnp.asarray([1 << i for i in range(nsteps)], jnp.int32)

    def step(acc, s):
        rolled = jnp.roll(acc, -s, axis=-1)
        tot = P.point_limbs(P.steady(P.padd(
            P.point_from_limbs(curve, acc), P.point_from_limbs(curve, rolled))))
        if mode == "suffix":
            keep = (idx + s) < W            # lanes whose partner wrapped
            tot = jnp.where(keep, tot, acc)
        return tot, None

    out, _ = jax.lax.scan(step, limbs, shifts, unroll=min(unroll, nsteps))
    return out


def msm_pippenger(curve: CurveSpec, xs, ys, inf_mask, k_limbs, w: int = 13,
                  lanes: int = 8192, scalar_bits=None, seg_unroll: int = 1,
                  hs_unroll: int = 1, kernels=None,
                  signed: bool = False) -> Point:
    """Bucketed Pippenger MSM -> single point (batch ()). See module doc.

    N must be a multiple of `lanes` (a power of two); w <= 16.
    signed=True uses signed-digit recoding (wide_window_digits_signed):
    buckets halve to 2^(w-1) so w can grow one step at the same bucket
    budget — fewer windows, hence fewer of the payload gathers that are the
    measured floor (PERF.md). The negated-point payload is a SECOND
    pre-negated row table; the per-window gather picks row order + neg*N,
    so signed costs zero extra gather traffic.
    seg_unroll/hs_unroll: lax.scan unroll factors. A lone point-add per loop
    iteration costs ~1ms on v5e (per-iteration overhead + unfused kernels);
    unrolling lets XLA fuse consecutive adds like the flat batched path
    (~3us per width-8192 add) at the price of a proportionally larger
    compiled program — dial down for compile-sensitive paths (the driver
    dryrun uses 1).
    """
    f = curve.field
    n = f.n_limbs
    N = xs.batch_shape[0]
    L = min(lanes, N & (-N))
    assert N % L == 0 and L & (L - 1) == 0, (N, L)
    C = N // L
    nbuck = 1 << (w - 1) if signed else 1 << w
    # fused Mosaic kernels are the default TPU path (segmented scan, lane
    # fix-up, bucket reduction, window combine — all grid-stepped, so cold
    # compile is minutes not the round-2 "full" mode's ~16; TPU_ECC_KERNELS=0
    # or kernels=False reverts to the XLA graphs, the CPU/test path)
    use_k = bool(kernels)
    if kernels is None:
        import os
        from ..ops import pallas_kernels as PK
        use_k = (os.environ.get("TPU_ECC_KERNELS", "1") != "0"
                 and jax.default_backend() == "tpu" and PK._supported(curve)
                 and L % 128 == 0)
    use_full = use_k and L % 128 == 0 and nbuck % 128 == 0
    import os
    _interp = os.environ.get("TPU_ECC_INTERPRET") == "1"  # CPU kernel tests

    pts = P.from_affine(curve, xs, ys, inf_mask)
    pl = P.point_limbs(P.steady(pts))                       # [3, n, N]
    if signed:
        keys, negs = wide_window_digits_signed(curve, k_limbs, w, scalar_bits)
        digs = (keys, negs.astype(U32))                     # [nw', N] each
    else:
        digs = wide_window_digits(curve, k_limbs, w, scalar_bits)  # [nw, N]

    # TPU memory-layout discipline (measured on v5e, PERF.md): random gathers
    # and scatters must move contiguous *rows*, so the payload lives
    # point-major ([N, 3n]: one point = one 240B row) around the sort, and
    # every transpose is materialized behind an optimization_barrier so the
    # sequential scan reads contiguous [3, n, L] slices instead of re-doing
    # a strided transpose per step.
    pl_major = jax.lax.optimization_barrier(
        jnp.moveaxis(pl.reshape(3 * n, N), -1, 0))          # [N, 3n]

    ident1 = P.point_limbs(P.identity(curve))               # [3, n]
    ident_L = jnp.broadcast_to(ident1[..., None], (3, n, L))
    lane_idx = jnp.arange(L, dtype=jnp.int32)
    lsteps = max(L.bit_length() - 1, 0)

    def window(acc_l, dig):
        # 1) sort by digit; gather the point payload as contiguous rows.
        # One sort_key_val yields keys AND the payload row index (argsort is
        # sort_key_val internally; a separate dig[order] re-gather cost
        # ~5 ms/window). Signed mode rides the sign bit in bit 31 of the
        # carried row index — NO extra gather and NO doubled payload table
        # (both measured to cost ~the one window the recoding saves: a
        # post-sort neg[order] lookup is row-count-bound like any gather,
        # and a 2N-row twin table slows every payload gather ~6%); the
        # y-negation happens IN-KERNEL in the segmented scan (segscan_call
        # signed=True), where it is register-level VPU work.
        if signed:
            dig, neg = dig
            rows0 = jnp.arange(N, dtype=U32) | (neg << np.uint32(31))
        else:
            rows0 = jnp.arange(N, dtype=U32)
        skey, ridx = jax.lax.sort_key_val(dig, rows0)
        if signed:
            neg_sorted = ridx >> np.uint32(31)              # [N]
            ridx = (ridx & np.uint32(0x7FFFFFFF)).astype(jnp.int32)
        smaj = jnp.take(pl_major, ridx, axis=0)             # [N, 3n]
        # 2) chunk layout: lane l holds sorted[l*C : (l+1)*C]
        key2 = skey.reshape(L, C).T                         # [C, L]
        if signed and not use_k:
            # portable path: negate gathered y rows where the digit was
            # negative (the kernel path negates inside segscan_call instead;
            # fneg/kneg share fe._sub_bias, so both stay bit-equal)
            y_l = smaj[:, n:2 * n].T                        # [n, N]
            yn = F._steady(F.fneg(F.fe_steady(f, y_l))).limbs
            y_sel = jnp.where(neg_sorted[None, :] == 1, yn, y_l)
            smaj = jnp.concatenate(
                [smaj[:, :n], y_sel.T, smaj[:, 2 * n:]], axis=1)
        val2 = jax.lax.optimization_barrier(
            jnp.moveaxis(smaj.reshape(L, C, 3 * n), 0, -1)
            .reshape(C, 3, n, L))                           # [C, 3, n, L]

        # 3) per-lane serial segmented scan (1 element-add per point)
        def seg_step(carry, xs_):
            pk, pacc = carry
            k_, v_ = xs_
            cand = P.point_limbs(P.steady(P.padd(
                P.point_from_limbs(curve, pacc),
                P.point_from_limbs(curve, v_))))
            newacc = jnp.where(k_ == pk, cand, v_)
            return (k_, newacc), newacc

        if use_k:
            from ..ops import pallas_kernels as PK
            if signed:
                neg2 = neg_sorted.reshape(L, C).T           # [C, L]
                scanned, last_key, t_l, lead_vals = PK.segscan_call(
                    curve, C, L, nbuck, interpret=_interp,
                    signed=True)(key2, val2, neg2)
            else:
                scanned, last_key, t_l, lead_vals = PK.segscan_call(
                    curve, C, L, nbuck, interpret=_interp)(key2, val2)
        else:
            init = (_as_varying(jnp.full((L,), nbuck, U32)),
                    _as_varying(ident_L))           # nbuck != any key
            (last_key, t_l), scanned = jax.lax.scan(
                seg_step, init, (key2, val2), unroll=min(seg_unroll, C))
            lead_vals = None
        first_key = key2[0]

        # 4) stitch runs crossing lane boundaries: segmented Hillis-Steele
        # over lanes keyed on last_key (monotone keys => endpoint equality
        # implies the whole span matches)
        def fix_step(vals, s):
            rolled = jnp.roll(vals, s, axis=-1)
            cand = P.point_limbs(P.steady(P.padd(
                P.point_from_limbs(curve, vals),
                P.point_from_limbs(curve, rolled))))
            ok = (jnp.roll(last_key, s) == last_key) & (lane_idx >= s)
            return jnp.where(ok, cand, vals), None

        # 5) value at each lane's leading-run end. The fused kernel tracks it
        # in-kernel (a lane-indexed take_along_axis over [C, 3, n, L] is a
        # minor-axis gather, ~5 ms per 2^20 window); the XLA path gathers it.
        if lead_vals is None:
            lead_end = jnp.sum((key2 == first_key[None, :]).astype(jnp.int32),
                               axis=0) - 1                  # [L]
            lead_vals = jnp.take_along_axis(
                scanned, jnp.broadcast_to(lead_end[None, None, None, :],
                                          (1, 3, n, L)), axis=0)[0]  # [3,n,L]
        # 4) stitch runs crossing lane boundaries + apply the carry
        if use_full:
            # grid-stepped fused fix-up kernel (TPU-verified vs the XLA path
            # and the host oracle, tools/verify_full_msm.py)
            from ..ops import pallas_kernels as PK
            fixed = PK.fixup_call(curve, L, interpret=_interp)(
                t_l, last_key, first_key, lead_vals)
        else:
            if lsteps:
                shifts = jnp.asarray([1 << i for i in range(lsteps)],
                                     jnp.int32)
                T_incl, _ = jax.lax.scan(fix_step, t_l, shifts,
                                         unroll=min(hs_unroll, lsteps))
            else:
                T_incl = t_l
            carry_ok = (first_key == jnp.roll(last_key, 1)) & (lane_idx >= 1)
            carry = jnp.where(carry_ok, jnp.roll(T_incl, 1, axis=-1), ident_L)
            fixed = P.point_limbs(P.steady(P.padd(
                P.point_from_limbs(curve, lead_vals),
                P.point_from_limbs(curve, carry))))

        # 6+7) per-bucket run-end LOOKUP: binary-search the sorted keys for
        # each bucket's last occurrence and gather its prefix sum — nbuck-row
        # gathers instead of the former N-row scatter (which serialized, and
        # whose [N, 3n] transposed source cost ~500MB of traffic per window).
        # A run that reaches its lane's start spans lanes; its complete sum
        # is the carry-fixed lane total from step 4+5.
        bids = jnp.arange(nbuck, dtype=U32)
        bidx = jnp.searchsorted(skey, bids, side="right").astype(jnp.int32) - 1
        safe = jnp.maximum(bidx, 0)                         # [nbuck]
        have = (bidx >= 0) & (jnp.take(skey, safe) == bids)
        lane = safe // C
        pos = safe % C
        # contiguous-row gathers only (a 2-D [pos, .., lane] fancy-index is a
        # minor-axis gather, ~2x slower measured): one materialized transpose
        # of `scanned` to (pos, lane)-major rows, then flat row lookups
        scn_rows = jax.lax.optimization_barrier(
            jnp.moveaxis(scanned.reshape(C, 3 * n, L), -1, 1)
            .reshape(C * L, 3 * n))
        end_vals = jnp.take(scn_rows, pos * L + lane,
                            axis=0).reshape(nbuck, 3, n)
        spans = jnp.take(first_key, lane) == bids
        span_vals = jnp.take(jnp.moveaxis(fixed.reshape(3 * n, L), -1, 0),
                             lane, axis=0).reshape(nbuck, 3, n)
        ident_b = jnp.broadcast_to(ident1[None], (nbuck, 3, n))
        m_have = have[:, None, None]
        m_span = spans[:, None, None]
        bucket_vals = jnp.where(m_have & m_span, span_vals,
                                jnp.where(m_have, end_vals, ident_b))
        buckets = jnp.moveaxis(bucket_vals, 0, -1)          # [3, n, nbuck]

        # 8) weighted bucket sum. Unsigned: bucket b holds digit b, so
        # sum_b b*S_b = sum_{b>=1} suffix_b (bucket 0 dropped). Signed:
        # bucket b holds |digit| = b+1, so sum_b (b+1)*S_b = sum of ALL
        # suffixes (no drop).
        nsteps = nbuck.bit_length() - 1
        if use_full:
            from ..ops import pallas_kernels as PK
            red = PK.bucket_reduce_call(curve, nbuck, drop0=not signed,
                                        interpret=_interp)(buckets)
            s_l = red[..., 0]
        else:
            suff = _hs_scan(curve, buckets, nsteps, "suffix",
                            unroll=hs_unroll)
            if not signed:
                suff = suff.at[:, :, 0].set(ident1)         # drop bucket 0
            s_l = _hs_scan(curve, suff, nsteps, "total",
                           unroll=hs_unroll)[..., 0]
        return None, s_l

    # per-window sums S_j (MSB window first), then one Horner combine
    # acc = 2^w * acc + S_j — as a fused grid-stepped kernel on TPU (the XLA
    # formulation paid nw*(w+1) single-point op dispatches)
    _, s_all = jax.lax.scan(window, None, digs)             # [nw, 3, n]
    nw = s_all.shape[0]
    if use_full:
        from ..ops import pallas_kernels as PK
        s_b = jnp.broadcast_to(s_all[..., None, None], (nw, 3, n, 8, 128))
        out = PK.horner_call(curve, w, nw, interpret=_interp)(s_b)
        return P.point_from_limbs(curve, out[..., 0, 0])

    def comb(acc_l, s_l):
        def dbl(_, a):
            return P.point_limbs(P.steady(P.pdouble(
                P.point_from_limbs(curve, a))))

        acc_l = jax.lax.fori_loop(0, w, dbl, acc_l,
                                  unroll=min(hs_unroll, w))
        acc = P.padd(P.point_from_limbs(curve, acc_l),
                     P.point_from_limbs(curve, s_l))
        return P.point_limbs(P.steady(acc)), None

    acc_l, _ = jax.lax.scan(comb, _as_varying(ident1), s_all)
    return P.point_from_limbs(curve, acc_l)


# ---------------------------------------------------------------------------
# multi-device sharded MSM
# ---------------------------------------------------------------------------

def msm_sharded(curve: CurveSpec, mesh: Mesh, axis, xs_l, ys_l, inf_mask,
                k_l, terms: int = 8, scalar_bits=None, method: str = "straus",
                w: int = 13, lanes: int = 8192, seg_unroll: int = 8,
                hs_unroll: int = 4, reduce_method: str = "auto",
                signed: bool = False):
    """MSM with the point axis sharded over `axis` of `mesh`.

    `axis` is one mesh axis name or a tuple ordered outermost first, e.g.
    ("dcn", "ici") for a multi-host topology: the reduction is then
    hierarchical — per-device partials are folded on the innermost (ICI)
    axis first, and only ONE already-folded point per slice (~240B) crosses
    each outer (DCN) axis for its own small fold.

    Two collective implementations sit behind the seam
    (parallel/collectives.py), selected per axis by `reduce_method`:
      - "gather": all_gather the partials + ceil(log2 D) tree fold — wins at
        large D (log depth).
      - "ring": D-1 nearest-neighbor ppermute steps, one padd each — pure
        neighbor traffic (no gather fan-in), O(1) memory; wins on short
        ICI axes where the point payload is tiny.
      - "auto": ring for axes of size <= 8, gather above (COMPILE.md has
        the measured program sizes behind the threshold).

    Inputs are raw arrays (limb arrays [n, N] / mask [N]) sharded on the
    point axis over all the given axes; output is the MSM result's packed
    limbs [3, n] (identical on every device by construction; the body
    returns the per-device copy so the varying-axes checker stays ENABLED,
    and the host slices one copy).
    """
    from . import collectives as C

    axes = (axis,) if isinstance(axis, str) else tuple(axis)
    f = curve.field

    def _fold_kind(ax: str) -> str:
        if reduce_method != "auto":
            return reduce_method
        return "ring" if mesh.shape[ax] <= 8 else "gather"

    def _fold_pt(a_l, b_l):
        s = P.padd(P.point_from_limbs(curve, a_l),
                   P.point_from_limbs(curve, b_l))
        return P.point_limbs(P.steady(s))

    def local(xs_s, ys_s, inf_s, k_s):
        global _VMA_AXES
        _VMA_AXES = axes
        xs = F.fe_steady(f, xs_s)
        ys = F.fe_steady(f, ys_s)
        if method == "pippenger":
            pt = msm_pippenger(curve, xs, ys, inf_s, k_s, w=w, lanes=lanes,
                               scalar_bits=scalar_bits, seg_unroll=seg_unroll,
                               hs_unroll=hs_unroll, signed=signed)
            packed = P.point_limbs(pt)[..., None]        # [3, n, 1]
        else:
            pt = msm_local_lanes(curve, xs, ys, inf_s, k_s, terms, scalar_bits)
            packed = P.point_limbs(pt)                   # [3, n, lanes]
        for ax in reversed(axes):                        # innermost first
            if _fold_kind(ax) == "ring":
                # fold local lanes to ONE point, then ring-reduce it
                red = tree_reduce_points(P.point_from_limbs(curve, packed))
                packed = C.ppermute_ring_reduce(
                    P.point_limbs(red), ax, _fold_pt)[..., None]
            else:
                allp = C.all_gather(packed, ax, axis=2, tiled=True)
                red = tree_reduce_points(P.point_from_limbs(curve, allp))
                packed = P.point_limbs(red)[..., None]
        _VMA_AXES = ()
        return packed                                    # [3, n, 1] per dev

    # out_specs keeps the device axis: the body's result is *varying* over
    # the mesh axes as far as the static checker can see (it cannot prove
    # the fold replicates), so we return every device's — identical — copy
    # and slice one on the host. check_vma stays at its safe default.
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(PS(None, axes), PS(None, axes), PS(axes), PS(None, axes)),
        out_specs=PS(None, None, axes),
    )
    return fn(xs_l, ys_l, inf_mask, k_l)[..., 0]


@functools.lru_cache(maxsize=None)
def _msm_jit(curve: CurveSpec, mesh, axis, terms, scalar_bits, method, w,
             lanes, seg_unroll, hs_unroll, reduce_method="auto",
             signed=False):
    """Memoized jitted MSM kernel — `msm()` is a host entry called per
    aggregation; rebuilding the lambda each call would re-jit (and on
    XLA:CPU this program compiles in minutes, not seconds)."""
    if mesh is None:
        if method == "pippenger":
            kern = functools.partial(msm_pippenger, w=w, lanes=lanes,
                                     scalar_bits=scalar_bits,
                                     seg_unroll=seg_unroll,
                                     hs_unroll=hs_unroll, signed=signed)
        else:
            kern = functools.partial(msm_local, terms=terms,
                                     scalar_bits=scalar_bits)
        return jax.jit(
            lambda a, b, c, d: P.point_limbs(
                kern(curve, F.fe_steady(curve.field, a),
                     F.fe_steady(curve.field, b), c, d)))
    return jax.jit(functools.partial(
        msm_sharded, curve, mesh, axis, terms=terms,
        scalar_bits=scalar_bits, method=method, w=w, lanes=lanes,
        seg_unroll=seg_unroll, hs_unroll=hs_unroll,
        reduce_method=reduce_method, signed=signed))


@functools.lru_cache(maxsize=None)
def _to_affine_jit():
    return jax.jit(P.to_affine)


def msm(curve: CurveSpec, points, scalars, mesh: Mesh | None = None,
        axis: str = "dp", terms: int = 8, scalar_bits=None,
        method: str = "auto", w: int | None = None, lanes: int = 8192,
        seg_unroll: int = 8, hs_unroll: int = 4,
        reduce_method: str = "auto", signed: bool | None = None):
    """Host entry: points = [(x, y) ints], scalars = [ints] -> affine (x, y).

    Pads to a lane/term/device-aligned size with identity points, packs, runs
    the sharded (or single-device) kernel, returns the affine result.
    method: 'straus' (constant-time; small N), 'pippenger' (large public
    aggregations), or 'auto' (Pippenger from 2^14 points per device).
    axis: one mesh axis name or a tuple ordered outermost first (see
    msm_sharded's hierarchical reduction).
    """
    N = len(points)
    if mesh is None:
        D = 1
    else:
        axes = (axis,) if isinstance(axis, str) else tuple(axis)
        D = int(np.prod([mesh.shape[a] for a in axes]))
    if method == "auto":
        method = "pippenger" if N // max(D, 1) >= (1 << 14) else "straus"
    # signed-digit recoding is the Pippenger default (halved buckets -> one
    # more window bit at the same bucket budget; w=14 signed measured 2.12e6
    # vs 2.07e6 pts/s unsigned w=13 at 2^20 on v5e); pass signed=False /
    # w=13 to revert. Straus ignores both.
    if signed is None:
        signed = method == "pippenger"
    if w is None:
        w = 14 if signed else 13
    if method == "pippenger":
        lanes = min(lanes, 1 << max((N // max(D, 1)).bit_length() - 3, 3))
        unit = lanes * D
    else:
        unit = terms * 128 * D
    Np = -(-max(N, 1) // unit) * unit
    xs = [p[0] for p in points] + [curve.gx] * (Np - N)
    ys = [p[1] for p in points] + [curve.gy] * (Np - N)
    inf = np.array([False] * N + [True] * (Np - N))
    ks = list(scalars) + [0] * (Np - N)

    xs_l = F.fe_from_ints(curve.field, xs).limbs
    ys_l = F.fe_from_ints(curve.field, ys).limbs
    k_l = SM.pack_scalars(curve, ks)
    inf_j = jnp.asarray(inf)

    axis_t = (axis,) if isinstance(axis, str) else tuple(axis)
    out = _msm_jit(curve, mesh, axis_t if mesh is not None else None, terms,
                   scalar_bits, method, w, lanes, seg_unroll,
                   hs_unroll, reduce_method, signed)(xs_l, ys_l, inf_j, k_l)

    pt = P.point_from_limbs(curve, out)
    x, y, is_inf = _to_affine_jit()(pt)
    if bool(np.asarray(is_inf)):
        return None
    return F.fe_to_ints(x)[0], F.fe_to_ints(y)[0]
