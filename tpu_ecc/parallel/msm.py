"""Multi-scalar multiplication (MSM) with multi-device sharding.

The reference has no MSM beyond slice lincomb (k256/src/arithmetic/mul.rs:326-340);
this subsystem is new, designed TPU-first (SURVEY.md §2.8):

- v1 kernel (this file): *chunked shared-doubling Straus*. Points are processed
  in groups of T terms x B lanes; each group runs a windowed lincomb whose
  doublings are shared across the T terms, each lane accumulating its own
  partial sum; a final masked tree-reduction folds the B lanes. Work/point ~
  64*(4+T)/(T*B-per-group) lane point-ops — fully batched, no data-dependent
  memory traffic, constant-time by construction.
- Multi-device: the point axis is sharded over a mesh axis via shard_map; each
  device computes its shard's partial MSM; partials are combined with an
  all_gather + local point-add tree (EC addition is not an arithmetic psum).
  ICI carries 3*n_limbs*4 bytes per device — negligible.

A sorted/bucketed Pippenger (sort digits + segmented scan) is the planned v2
for large N; the sharding/collective structure stays identical.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as PS
from jax.experimental.shard_map import shard_map

from ..curves.specs import CurveSpec
from ..ops import fe as F
from ..ops import points as P
from ..ops import scalarmul as SM
from ..ops.points import Point


def tree_reduce_points(pt: Point) -> Point:
    """Fold the last batch axis of a point batch into one point (log2 levels).
    The batch size must be a power of two; lanes hold identity padding."""
    c = pt.curve
    n = pt.batch_shape[-1]
    assert n & (n - 1) == 0, "tree_reduce needs power-of-two lanes"
    while n > 1:
        n //= 2
        lo = Point(_half(pt.x, 0, n), _half(pt.y, 0, n), _half(pt.z, 0, n), c)
        hi = Point(_half(pt.x, n, n), _half(pt.y, n, n), _half(pt.z, n, n), c)
        pt = P.steady(P.padd(lo, hi))
    return pt


def _half(fe: F.FE, start, size):
    return F.FE(jax.lax.slice_in_dim(fe.limbs, start, start + size, axis=-1),
                fe.spec, fe.bound, fe.vmax)


def msm_local(curve: CurveSpec, xs, ys, inf_mask, k_limbs, terms: int = 8,
              scalar_bits=None) -> Point:
    """MSM over one device's points: sum(k_i * P_i) -> a single point (batch ()).

    xs/ys: FE with batch [N]; inf_mask: bool[N] identity markers (padding);
    k_limbs: uint32[ns, N] canonical scalars. N must be divisible by
    terms * lanes; the caller pads with identity + zero scalars.
    """
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

    acc0 = P.point_limbs(P.identity(curve, (lanes,)))
    acc0 = acc0 + (k_r[0, 0, 0] & np.uint32(0))  # see _lincomb_terms taint note
    acc_l = jax.lax.fori_loop(0, G, group, acc0) if G > 1 else group(0, acc0)
    return tree_reduce_points(P.point_from_limbs(curve, acc_l))


def _pick_lanes(N, terms):
    per = N // terms
    lanes = per & (-per)          # largest power-of-two divisor
    lanes = min(lanes, 4096)
    assert N % (terms * lanes) == 0, (N, terms, lanes)
    return lanes


def _lincomb_terms(curve: CurveSpec, pts: Point, k_limbs, terms: int,
                   scalar_bits=None) -> Point:
    """lincomb over the `terms` axis with lanes batch: pts batch [T, B],
    k_limbs [ns, T, B] -> Point batch [B]."""
    tbls = []
    for t in range(terms):
        sl = Point(_sel(pts.x, t), _sel(pts.y, t), _sel(pts.z, t), curve)
        tbls.append(SM._point_table(sl))
    digss = SM.window_digits(curve, k_limbs, scalar_bits)   # [nw, T, B]

    def body(acc_l, digs):
        acc = P.point_from_limbs(curve, acc_l)
        for _ in range(4):
            acc = P.steady(P.pdouble(acc))
        for t in range(terms):
            term = P.point_from_limbs(curve, SM._ct_lookup(tbls[t], digs[t]))
            acc = P.steady(P.padd(acc, term))
        return P.point_limbs(acc), None

    acc0 = P.point_limbs(P.identity(curve, pts.batch_shape[1:]))
    # taint with (zeroed) input data so the carry is device-varying under
    # shard_map (scan requires carry in/out 'varying manual axes' to match)
    acc0 = acc0 + (k_limbs[0, 0] & np.uint32(0))
    acc_l, _ = jax.lax.scan(body, acc0, digss)
    return P.point_from_limbs(curve, acc_l)


def _sel(fe: F.FE, t):
    return F.FE(fe.limbs[:, t], fe.spec, fe.bound, fe.vmax)


# ---------------------------------------------------------------------------
# multi-device sharded MSM
# ---------------------------------------------------------------------------

def msm_sharded(curve: CurveSpec, mesh: Mesh, axis: str, xs_l, ys_l, inf_mask,
                k_l, terms: int = 8, scalar_bits=None):
    """MSM with the point axis sharded over `axis` of `mesh`.

    Inputs are raw arrays (limb arrays [n, N] / mask [N]) sharded on the point
    axis; output is the replicated MSM result's packed limbs [3, n].
    Per-device partials travel over ICI via all_gather (one tiny point each)
    and every device folds them locally — deterministic and cheap.
    """
    f = curve.field

    def local(xs_s, ys_s, inf_s, k_s):
        xs = F.fe_steady(f, xs_s)
        ys = F.fe_steady(f, ys_s)
        pt = msm_local(curve, xs, ys, inf_s, k_s, terms, scalar_bits)
        packed = P.point_limbs(pt)[None]            # [1, 3, n]
        allp = jax.lax.all_gather(packed, axis, axis=0, tiled=True)  # [D, 3, n]
        D = allp.shape[0]
        acc = P.point_from_limbs(curve, allp[0])
        for d in range(1, D):
            acc = P.steady(P.padd(acc, P.point_from_limbs(curve, allp[d])))
        return P.point_limbs(acc)

    kw = {}
    try:  # the output is replicated by construction (same fold of the same
        # all_gathered partials on every device); the static VMA checker
        # can't see that, so disable it (API name varies across jax versions)
        import inspect
        sig = inspect.signature(shard_map)
        if "check_vma" in sig.parameters:
            kw["check_vma"] = False
        elif "check_rep" in sig.parameters:
            kw["check_rep"] = False
    except (ValueError, TypeError):
        pass
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(PS(None, axis), PS(None, axis), PS(axis), PS(None, axis)),
        out_specs=PS(), **kw,
    )
    return fn(xs_l, ys_l, inf_mask, k_l)


def msm(curve: CurveSpec, points, scalars, mesh: Mesh | None = None,
        axis: str = "dp", terms: int = 8, scalar_bits=None):
    """Host entry: points = [(x, y) ints], scalars = [ints] -> affine (x, y).

    Pads to a lane/term/device-aligned size with identity points, packs, runs
    the sharded (or single-device) kernel, returns the affine result.
    """
    N = len(points)
    D = mesh.shape[axis] if mesh is not None else 1
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

    if mesh is None:
        xs_f = F.fe_steady(curve.field, xs_l)
        ys_f = F.fe_steady(curve.field, ys_l)
        out = jax.jit(
            lambda a, b, c, d: P.point_limbs(
                msm_local(curve, F.fe_steady(curve.field, a),
                          F.fe_steady(curve.field, b), c, d, terms,
                          scalar_bits))
        )(xs_l, ys_l, inf_j, k_l)
    else:
        out = jax.jit(functools.partial(
            msm_sharded, curve, mesh, axis, terms=terms,
            scalar_bits=scalar_bits)
        )(xs_l, ys_l, inf_j, k_l)

    pt = P.point_from_limbs(curve, out)
    x, y, is_inf = jax.jit(P.to_affine)(pt)
    if bool(np.asarray(is_inf)):
        return None
    return F.fe_to_ints(x)[0], F.fe_to_ints(y)[0]
