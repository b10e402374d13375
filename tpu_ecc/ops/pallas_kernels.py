"""Pallas TPU kernels for the hot point operations (round-2, Mosaic-native).

The whole complete-addition formula (12 field muls + reductions) runs inside
one kernel invocation per batch block: every intermediate limb tile lives in
VMEM/registers, nothing spills to HBM between field ops.

Round-1 lesson (PERF.md): re-tracing the graph-level FE engine inside the
kernel was ~60x slower than XLA — Mosaic relayouts on every sublane-axis
concat. This version uses the kernel-native KFE engine (fe_kernel.py): one
[S, 128] tile per limb, the limb axis unrolled in Python, the convolution as
explicit accumulator locals — zero concat/pad/scatter in the kernel body.

Formulas are the same complete RCB 2015 algorithms as ops/points.py
(Algorithms 7/9 for a = 0, 4/6 for a = -3, 1/3 for generic a; cf.
k256/src/arithmetic/projective.rs:96-276 and primeorder/src/
point_arithmetic.rs), transcribed onto KFE. Both field backends are
kernel-native — solinas fold reduction AND Montgomery CIOS
(fe_kernel._mont_reduce_k) — so every registered curve routes here.

Layout: a point batch block is uint32[3, n_limbs, S, 128] — batch lanes
split (sublane, lane) so each per-limb op is a full native VPU tile.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..curves.specs import CurveSpec
from . import fe_kernel as K
from . import points as P


def _b3_mul_k(curve: CurveSpec, t: K.KFE) -> K.KFE:
    b3 = (3 * curve.b) % curve.p
    if curve.field.kind == "solinas" and b3 < (1 << 14):
        return K.kmul_small(t, b3)
    return K.kmul(K.kfe_const(curve.field, b3, t.limbs[0].shape), t)


def _b_mul_k(curve: CurveSpec, t: K.KFE) -> K.KFE:
    if curve.field.kind == "solinas" and curve.b < (1 << 14):
        return K.kmul_small(t, curve.b)
    return K.kmul(K.kfe_const(curve.field, curve.b, t.limbs[0].shape), t)


def _ka_mul(curve: CurveSpec, t: K.KFE) -> K.KFE:
    return K.kmul(K.kfe_const(curve.field, curve.a, t.limbs[0].shape), t)


def _kadd_a0(c: CurveSpec, X1, Y1, Z1, X2, Y2, Z2):
    """RCB 2015 Algorithm 7 (a = 0), KFE transcription of points._add_a0."""
    t0 = X1 * X2
    t1 = Y1 * Y2
    t2 = Z1 * Z2
    t3 = (X1 + Y1) * (X2 + Y2)
    t3 = t3 - (t0 + t1)
    t4 = (Y1 + Z1) * (Y2 + Z2)
    t4 = t4 - (t1 + t2)
    X3 = (X1 + Z1) * (X2 + Z2)
    Y3 = X3 - (t0 + t2)
    t0 = t0 + t0 + t0
    t2 = _b3_mul_k(c, t2)
    Z3 = t1 + t2
    t1 = t1 - t2
    Y3 = _b3_mul_k(c, Y3)
    X3 = t4 * Y3
    t2 = t3 * t1
    X3 = t2 - X3
    Y3 = Y3 * t0
    t1 = t1 * Z3
    Y3 = t1 + Y3
    t0 = t0 * t3
    Z3 = Z3 * t4
    Z3 = Z3 + t0
    return X3, Y3, Z3


def _kdouble_a0(c: CurveSpec, X, Y, Z):
    """RCB 2015 Algorithm 9 (a = 0), cf. points._double_a0."""
    t0 = Y * Y
    Z3 = t0 + t0
    Z3 = Z3 + Z3
    Z3 = Z3 + Z3
    t1 = Y * Z
    t2 = Z * Z
    t2 = _b3_mul_k(c, t2)
    X3 = t2 * Z3
    Y3 = t0 + t2
    Z3 = t1 * Z3
    t1 = t2 + t2
    t2 = t1 + t2
    t0 = t0 - t2
    Y3 = t0 * Y3
    Y3 = X3 + Y3
    t1 = X * Y
    X3 = t0 * t1
    X3 = X3 + X3
    return X3, Y3, Z3


def _kadd_am3(c: CurveSpec, X1, Y1, Z1, X2, Y2, Z2):
    """RCB 2015 Algorithm 4 (a = -3), cf. points._add_am3."""
    t0 = X1 * X2
    t1 = Y1 * Y2
    t2 = Z1 * Z2
    t3 = (X1 + Y1) * (X2 + Y2)
    t3 = t3 - (t0 + t1)
    t4 = (Y1 + Z1) * (Y2 + Z2)
    t4 = t4 - (t1 + t2)
    X3 = (X1 + Z1) * (X2 + Z2)
    Y3 = X3 - (t0 + t2)
    Z3 = _b_mul_k(c, t2)
    X3 = Y3 - Z3
    Z3 = X3 + X3
    X3 = X3 + Z3
    Z3 = t1 - X3
    X3 = t1 + X3
    Y3 = _b_mul_k(c, Y3)
    t1 = t2 + t2 + t2
    Y3 = Y3 - t1 - t0
    Y3 = Y3 + Y3 + Y3
    t0 = t0 + t0 + t0
    t0 = t0 - t1
    t1 = t4 * Y3
    t2 = t0 * Y3
    Y3 = X3 * Z3 + t2
    X3 = t3 * X3 - t1
    Z3 = t4 * Z3 + t3 * t0
    return X3, Y3, Z3


def _kdouble_am3(c: CurveSpec, X, Y, Z):
    """RCB 2015 Algorithm 6 (a = -3), cf. points._double_am3."""
    t0 = X * X
    t1 = Y * Y
    t2 = Z * Z
    t3 = X * Y
    t3 = t3 + t3
    Z3 = X * Z
    Z3 = Z3 + Z3
    Y3 = _b_mul_k(c, t2)
    Y3 = Y3 - Z3
    X3 = Y3 + Y3
    Y3 = X3 + Y3
    X3 = t1 - Y3
    Y3 = t1 + Y3
    Y3 = X3 * Y3
    X3 = X3 * t3
    t2 = t2 + t2 + t2
    Z3 = _b_mul_k(c, Z3)
    Z3 = Z3 - t2 - t0
    Z3 = Z3 + Z3 + Z3
    t0 = t0 + t0 + t0
    t0 = t0 - t2
    t0 = t0 * Z3
    Y3 = Y3 + t0
    t0 = Y * Z
    t0 = t0 + t0
    Z3 = t0 * Z3
    X3 = X3 - Z3
    Z3 = t0 * t1
    Z3 = Z3 + Z3
    Z3 = Z3 + Z3
    return X3, Y3, Z3


def _kadd_mixed_a0(c: CurveSpec, X1, Y1, Z1, x2, y2):
    """RCB 2015 Algorithm 8 (a = 0, Z2 = 1), cf. points._add_mixed_a0."""
    t0 = X1 * x2
    t1 = Y1 * y2
    t3 = (x2 + y2) * (X1 + Y1)
    t3 = t3 - (t0 + t1)
    t4 = y2 * Z1 + Y1
    Y3 = x2 * Z1 + X1
    t0 = t0 + t0 + t0
    t2 = _b3_mul_k(c, Z1)
    Z3 = t1 + t2
    t1 = t1 - t2
    Y3 = _b3_mul_k(c, Y3)
    X3 = t4 * Y3
    t2 = t3 * t1
    X3 = t2 - X3
    Y3 = Y3 * t0
    t1 = t1 * Z3
    Y3 = t1 + Y3
    t0 = t0 * t3
    Z3 = Z3 * t4
    Z3 = Z3 + t0
    return X3, Y3, Z3


def _kadd_mixed_am3(c: CurveSpec, X1, Y1, Z1, x2, y2):
    """RCB 2015 Algorithm 5 (a = -3, Z2 = 1), cf. points._add_mixed_am3."""
    t0 = X1 * x2
    t1 = Y1 * y2
    t3 = (x2 + y2) * (X1 + Y1)
    t3 = t3 - (t0 + t1)
    t4 = y2 * Z1 + Y1
    Y3 = x2 * Z1 + X1
    Z3 = _b_mul_k(c, Z1)
    X3 = Y3 - Z3
    Z3 = X3 + X3
    X3 = X3 + Z3
    Z3 = t1 - X3
    X3 = t1 + X3
    Y3 = _b_mul_k(c, Y3)
    t1 = Z1 + Z1 + Z1
    Y3 = Y3 - t1 - t0
    Y3 = Y3 + Y3 + Y3
    t0 = t0 + t0 + t0
    t0 = t0 - t1
    t1 = t4 * Y3
    t2 = t0 * Y3
    Y3 = X3 * Z3 + t2
    X3 = t3 * X3 - t1
    Z3 = t4 * Z3 + t3 * t0
    return X3, Y3, Z3


def _kadd_generic(c: CurveSpec, X1, Y1, Z1, X2, Y2, Z2):
    """RCB 2015 Algorithm 1 (generic a), cf. points._add_generic."""
    t0 = X1 * X2
    t1 = Y1 * Y2
    t2 = Z1 * Z2
    t3 = (X1 + Y1) * (X2 + Y2)
    t3 = t3 - (t0 + t1)
    t4 = (X1 + Z1) * (X2 + Z2)
    t4 = t4 - (t0 + t2)
    t5 = (Y1 + Z1) * (Y2 + Z2)
    t5 = t5 - (t1 + t2)
    Z3 = _ka_mul(c, t4)
    X3 = _b3_mul_k(c, t2)
    Z3 = X3 + Z3
    X3 = t1 - Z3
    Z3 = t1 + Z3
    Y3 = X3 * Z3
    t1 = t0 + t0 + t0
    t2 = _ka_mul(c, t2)
    t4 = _b3_mul_k(c, t4)
    t1 = t1 + t2
    t2 = _ka_mul(c, t0 - t2)
    t4 = t4 + t2
    Y3 = Y3 + t1 * t4
    X3 = t3 * X3 - t5 * t4
    Z3 = t5 * Z3 + t3 * t1
    return X3, Y3, Z3


def _kadd_mixed_generic(c: CurveSpec, X1, Y1, Z1, x2, y2):
    """RCB 2015 Algorithm 2 (generic a, Z2 = 1), cf. points._add_mixed_generic."""
    t0 = X1 * x2
    t1 = Y1 * y2
    t3 = (x2 + y2) * (X1 + Y1)
    t3 = t3 - (t0 + t1)
    t4 = x2 * Z1 + X1
    t5 = y2 * Z1 + Y1
    Z3 = _ka_mul(c, t4)
    X3 = _b3_mul_k(c, Z1)
    Z3 = X3 + Z3
    X3 = t1 - Z3
    Z3 = t1 + Z3
    Y3 = X3 * Z3
    t1 = t0 + t0 + t0
    t2 = _ka_mul(c, Z1)
    t4 = _b3_mul_k(c, t4)
    t1 = t1 + t2
    t2 = _ka_mul(c, t0 - t2)
    t4 = t4 + t2
    Y3 = Y3 + t1 * t4
    X3 = t3 * X3 - t5 * t4
    Z3 = t5 * Z3 + t3 * t1
    return X3, Y3, Z3


def _kdouble_generic(c: CurveSpec, X, Y, Z):
    """RCB 2015 Algorithm 3 (generic a), cf. points._double_generic."""
    t0 = X * X
    t1 = Y * Y
    t2 = Z * Z
    t3 = X * Y
    t3 = t3 + t3
    Z3 = X * Z
    Z3 = Z3 + Z3
    X3 = _ka_mul(c, Z3)
    Y3 = _b3_mul_k(c, t2)
    Y3 = X3 + Y3
    X3 = t1 - Y3
    Y3 = t1 + Y3
    Y3 = X3 * Y3
    X3 = t3 * X3
    Z3 = _b3_mul_k(c, Z3)
    t2 = _ka_mul(c, t2)
    t3 = _ka_mul(c, t0 - t2)
    t3 = t3 + Z3
    t0 = t0 + t0 + t0 + t2
    t0 = t0 * t3
    Y3 = Y3 + t0
    t2 = Y * Z
    t2 = t2 + t2
    X3 = X3 - t2 * t3
    Z3 = t2 * t1
    Z3 = Z3 + Z3
    Z3 = Z3 + Z3
    return X3, Y3, Z3


_KADD = {"a0": _kadd_a0, "a_minus3": _kadd_am3, "generic": _kadd_generic}
_KDOUBLE = {"a0": _kdouble_a0, "a_minus3": _kdouble_am3,
            "generic": _kdouble_generic}
_KADD_MIXED = {"a0": _kadd_mixed_a0, "a_minus3": _kadd_mixed_am3,
               "generic": _kadd_mixed_generic}


def _load(spec, ref, c: int):
    return K.kfe_from_rows(spec,
                           [ref[c, i, :, :] for i in range(spec.n_limbs)])


def _store(ref, c: int, fe: K.KFE):
    fe = K.ksteady(fe)
    for i, row in enumerate(fe.limbs):
        ref[c, i, :, :] = row


def _padd_kernel_body(curve: CurveSpec, a_ref, b_ref, o_ref):
    s = curve.field
    A = [_load(s, a_ref, c) for c in range(3)]
    B = [_load(s, b_ref, c) for c in range(3)]
    X3, Y3, Z3 = _KADD[curve.strategy](curve, *A, *B)
    for c, fe in enumerate((X3, Y3, Z3)):
        _store(o_ref, c, fe)


def _pdouble_kernel_body(curve: CurveSpec, a_ref, o_ref):
    s = curve.field
    A = [_load(s, a_ref, c) for c in range(3)]
    X3, Y3, Z3 = _KDOUBLE[curve.strategy](curve, *A)
    for c, fe in enumerate((X3, Y3, Z3)):
        _store(o_ref, c, fe)


def _supported(curve: CurveSpec):
    """All 12 curves: solinas + Montgomery KFE backends, all 3 RCB strategies."""
    return curve.field.kind in ("solinas", "mont") and curve.strategy in _KADD


def ladder_fits(curve: CurveSpec, T: int) -> bool:
    """Whether ladder_call's in-kernel tables fit the VMEM budget at the
    minimum legal lane block (S=8): (T*16+4)*3n tiles of [8,128] uint32
    within ~10MB. False for wide-limb multi-term ladders (p384/p521 T>=2),
    which stay on the XLA lincomb path."""
    return (T * 16 + 4) * 3 * curve.field.n_limbs * 8 * 512 <= 10 << 20


@functools.lru_cache(maxsize=None)
def _padd_call(curve: CurveSpec, batch: int, block: int):
    n = curve.field.n_limbs
    assert batch % block == 0 and block % 128 == 0
    S = block // 128
    rows = batch // 128
    spec = pl.BlockSpec((3, n, S, 128), lambda i: (0, 0, i, 0),
                        memory_space=pltpu.VMEM)

    def run(a, b):
        a4 = a.reshape(3, n, rows, 128)
        b4 = b.reshape(3, n, rows, 128)
        out = pl.pallas_call(
            functools.partial(_padd_kernel_body, curve),
            out_shape=jax.ShapeDtypeStruct((3, n, rows, 128), jnp.uint32),
            grid=(rows // S,),
            in_specs=[spec, spec],
            out_specs=spec,
        )(a4, b4)
        return out.reshape(3, n, batch)

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _pdouble_call(curve: CurveSpec, batch: int, block: int):
    n = curve.field.n_limbs
    assert batch % block == 0 and block % 128 == 0
    S = block // 128
    rows = batch // 128
    spec = pl.BlockSpec((3, n, S, 128), lambda i: (0, 0, i, 0),
                        memory_space=pltpu.VMEM)

    def run(a):
        a4 = a.reshape(3, n, rows, 128)
        out = pl.pallas_call(
            functools.partial(_pdouble_kernel_body, curve),
            out_shape=jax.ShapeDtypeStruct((3, n, rows, 128), jnp.uint32),
            grid=(rows // S,),
            in_specs=[spec],
            out_specs=spec,
        )(a4)
        return out.reshape(3, n, batch)

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def padd_chain_call(curve: CurveSpec, batch: int, block: int, repeat: int):
    """jitted (a_limbs, b_limbs) -> limbs of a + repeat*b computed as a
    `repeat`-long addition chain inside ONE kernel — every intermediate stays
    in VMEM. This is the fused design point the XLA path cannot express
    (measured 2x the XLA chain on v5e, PERF.md); the building block for
    fully-fused ladders."""
    assert _supported(curve)
    n = curve.field.n_limbs
    assert batch % block == 0 and block % 128 == 0
    S = block // 128
    rows = batch // 128
    spec = pl.BlockSpec((3, n, S, 128), lambda i: (0, 0, i, 0),
                        memory_space=pltpu.VMEM)

    def body(a_ref, b_ref, o_ref):
        s = curve.field
        A = [_load(s, a_ref, c) for c in range(3)]
        Bp = [_load(s, b_ref, c) for c in range(3)]
        for _ in range(repeat):
            A = [K.ksteady(v) for v in _KADD[curve.strategy](curve, *A, *Bp)]
        for c, fe in enumerate(A):
            _store(o_ref, c, fe)

    def run(a, b):
        out = pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct((3, n, rows, 128), jnp.uint32),
            grid=(rows // S,),
            in_specs=[spec, spec],
            out_specs=spec,
        )(a.reshape(3, n, rows, 128), b.reshape(3, n, rows, 128))
        return out.reshape(3, n, batch)

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def segscan_call(curve: CurveSpec, C: int, L: int, nbuck: int,
                 Cb: int = 8, Lb: int = 1024):
    """Fused segmented-scan kernel for the Pippenger bucket accumulation
    (parallel/msm.py): each of L lanes serially accumulates its chunk of C
    digit-sorted points, resetting on key change. The entire C-long serial
    chain runs inside Pallas with the carry in VMEM scratch across grid
    steps — the XLA formulation paid ~1.9ms per point-add step (while-loop
    carries + spills); here a step is ~4us of fused VPU work.

    jitted (key2 [C, L] uint32, val2 [C, 3, n, L] uint32) ->
      (scanned [C, 3, n, L], last_key [L], tail [3, n, L]).
    Grid: (L/Lb lane blocks) x (C/Cb row chunks, innermost; the scratch
    carry persists across the sequential TPU grid).
    """
    assert _supported(curve)
    f = curve.field
    n = f.n_limbs
    Cb = min(Cb, C)
    while C % Cb:           # largest row-chunk <= Cb dividing C
        Cb -= 1
    Lb = min(Lb, L)
    assert L % Lb == 0 and Lb % 128 == 0
    S = Lb // 128
    rowsL = L // 128
    GC = C // Cb
    GL = L // Lb
    sentinel = np.uint32(nbuck)

    from ..utils.bigint import int_to_limbs
    one_limbs = int_to_limbs(f.encode_int(1), n, f.limb_bits)

    def body(key_ref, val_ref, out_ref, lk_ref, tail_ref, pk_ref, acc_ref):
        ci = pl.program_id(1)

        @pl.when(ci == 0)
        def _init():
            pk_ref[...] = jnp.full((S, 128), sentinel, jnp.uint32)
            for c in range(3):
                for i in range(n):
                    v = one_limbs[i] if c == 1 else 0  # identity (0 : 1 : 0)
                    acc_ref[c, i, :, :] = jnp.full((S, 128), np.uint32(v),
                                                   jnp.uint32)

        pk = pk_ref[...]
        acc = [[acc_ref[c, i, :, :] for i in range(n)] for c in range(3)]
        for r in range(Cb):
            k = key_ref[r, :, :]
            v = [[val_ref[r, c, i, :, :] for i in range(n)] for c in range(3)]
            A = [K.kfe_from_rows(f, rows) for rows in acc]
            V = [K.kfe_from_rows(f, rows) for rows in v]
            cand = [K.ksteady(x) for x in _KADD[curve.strategy](curve, *A, *V)]
            same = k == pk
            acc = [[jnp.where(same, cand[c].limbs[i], v[c][i])
                    for i in range(n)] for c in range(3)]
            for c in range(3):
                for i in range(n):
                    out_ref[r, c, i, :, :] = acc[c][i]
            pk = k
        pk_ref[...] = pk
        for c in range(3):
            for i in range(n):
                acc_ref[c, i, :, :] = acc[c][i]

        @pl.when(ci == GC - 1)
        def _fin():
            lk_ref[...] = pk
            for c in range(3):
                for i in range(n):
                    tail_ref[c, i, :, :] = acc[c][i]

    kv = pl.BlockSpec((Cb, S, 128), lambda l, c: (c, l, 0),
                      memory_space=pltpu.VMEM)
    vv = pl.BlockSpec((Cb, 3, n, S, 128), lambda l, c: (c, 0, 0, l, 0),
                      memory_space=pltpu.VMEM)
    ov = pl.BlockSpec((Cb, 3, n, S, 128), lambda l, c: (c, 0, 0, l, 0),
                      memory_space=pltpu.VMEM)
    lkv = pl.BlockSpec((S, 128), lambda l, c: (l, 0), memory_space=pltpu.VMEM)
    tv = pl.BlockSpec((3, n, S, 128), lambda l, c: (0, 0, l, 0),
                      memory_space=pltpu.VMEM)

    def run(key2, val2):
        k4 = key2.reshape(C, rowsL, 128)
        v5 = val2.reshape(C, 3, n, rowsL, 128)
        scanned, lk, tail = pl.pallas_call(
            body,
            out_shape=(jax.ShapeDtypeStruct((C, 3, n, rowsL, 128), jnp.uint32),
                       jax.ShapeDtypeStruct((rowsL, 128), jnp.uint32),
                       jax.ShapeDtypeStruct((3, n, rowsL, 128), jnp.uint32)),
            grid=(GL, GC),
            in_specs=[kv, vv],
            out_specs=(ov, lkv, tv),
            scratch_shapes=[pltpu.VMEM((S, 128), jnp.uint32),
                            pltpu.VMEM((3, n, S, 128), jnp.uint32)],
        )(k4, v5)
        return (scanned.reshape(C, 3, n, L), lk.reshape(L),
                tail.reshape(3, n, L))

    return run


def _shift_flat(x, s: int, forward: bool):
    """Circular shift of a [S, 128] tile over its FLATTENED S*128 index:
    forward=True -> y[j] = x[j+s]; False -> y[j] = x[j-s]. s static.
    Powers-of-two shifts decompose into a sublane roll plus a lane roll with
    a row-boundary select — all Mosaic-friendly static ops."""
    S = x.shape[0]
    sgn = 1 if forward else -1
    q, r = divmod(s, 128)
    z = jnp.roll(x, -sgn * q, axis=0) if q else x
    if r == 0:
        return z
    a = jnp.roll(z, -sgn * r, axis=1)
    b = jnp.roll(a, -sgn, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
    if forward:
        return jnp.where(lane < 128 - r, a, b)
    return jnp.where(lane >= r, a, b)


def _ident_rows(f, shape):
    from ..utils.bigint import int_to_limbs

    one = int_to_limbs(f.encode_int(1), f.n_limbs, f.limb_bits)
    return [[jnp.full(shape, np.uint32(one[i] if c == 1 else 0), jnp.uint32)
             for i in range(f.n_limbs)] for c in range(3)]


@functools.lru_cache(maxsize=None)
def fixup_call(curve: CurveSpec, L: int):
    """Fused Pippenger lane fix-up (parallel/msm.py step 4+5): segmented
    Hillis-Steele over the L per-lane tail sums (keyed on last_key, monotone)
    followed by the carry select and the leading-run correction padd — 14
    point-ops in one kernel instead of 14 separate XLA padds.

    jitted (t_l [3,n,L], last_key [L], first_key [L], lead_vals [3,n,L])
      -> fixed [3, n, L]
    """
    assert _supported(curve)
    f = curve.field
    n = f.n_limbs
    assert L % 128 == 0
    S = L // 128
    nsteps = max(L.bit_length() - 1, 0)

    def body(t_ref, lk_ref, fk_ref, lv_ref, o_ref):
        lk = lk_ref[...]
        flat = (jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0) * 128
                + jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1))
        vals = [[t_ref[c, i, :, :] for i in range(n)] for c in range(3)]
        for k in range(nsteps):
            s = 1 << k
            rolled = [[_shift_flat(vals[c][i], s, False) for i in range(n)]
                      for c in range(3)]
            A = [K.kfe_from_rows(f, vals[c]) for c in range(3)]
            B = [K.kfe_from_rows(f, rolled[c]) for c in range(3)]
            cand = [K.ksteady(x) for x in _KADD[curve.strategy](curve, *A, *B)]
            ok = (_shift_flat(lk, s, False) == lk) & (flat >= s)
            vals = [[jnp.where(ok, cand[c].limbs[i], vals[c][i])
                     for i in range(n)] for c in range(3)]
        # carry = T_incl[l-1] if first_key[l] == last_key[l-1] else identity
        carry_ok = (fk_ref[...] == _shift_flat(lk, 1, False)) & (flat >= 1)
        ident = _ident_rows(f, (S, 128))
        carry = [[jnp.where(carry_ok, _shift_flat(vals[c][i], 1, False),
                            ident[c][i]) for i in range(n)] for c in range(3)]
        LV = [K.kfe_from_rows(f, [lv_ref[c, i, :, :] for i in range(n)])
              for c in range(3)]
        CA = [K.kfe_from_rows(f, carry[c]) for c in range(3)]
        out = [K.ksteady(x) for x in _KADD[curve.strategy](curve, *LV, *CA)]
        for c in range(3):
            for i in range(n):
                o_ref[c, i, :, :] = out[c].limbs[i]

    pv = pl.BlockSpec(memory_space=pltpu.VMEM)

    def run(t_l, last_key, first_key, lead_vals):
        out = pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct((3, n, S, 128), jnp.uint32),
            in_specs=[pv, pv, pv, pv],
            out_specs=pv,
        )(t_l.reshape(3, n, S, 128), last_key.reshape(S, 128),
          first_key.reshape(S, 128), lead_vals.reshape(3, n, S, 128))
        return out.reshape(3, n, L)

    return run


@functools.lru_cache(maxsize=None)
def bucket_reduce_call(curve: CurveSpec, nbuck: int):
    """Fused Pippenger bucket reduction (parallel/msm.py step 8):
    sum_b b*S_b = sum_{b>=1} suffix_b via a guarded suffix Hillis-Steele then
    a circular all-reduce, 2*log2(nbuck) point-ops in one kernel.

    jitted (buckets [3, n, nbuck]) -> S [3, n] packed as [3, n, nbuck]
    (every flat lane holds the total; the caller takes lane 0).
    """
    assert _supported(curve)
    f = curve.field
    n = f.n_limbs
    assert nbuck % 128 == 0
    S = nbuck // 128
    nsteps = nbuck.bit_length() - 1

    def body(b_ref, o_ref):
        flat = (jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0) * 128
                + jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1))
        vals = [[b_ref[c, i, :, :] for i in range(n)] for c in range(3)]
        ident = _ident_rows(f, (S, 128))

        def hs(vals, guarded):
            for k in range(nsteps):
                s = 1 << k
                rolled = [[_shift_flat(vals[c][i], s, True) for i in range(n)]
                          for c in range(3)]
                A = [K.kfe_from_rows(f, vals[c]) for c in range(3)]
                B = [K.kfe_from_rows(f, rolled[c]) for c in range(3)]
                cand = [K.ksteady(x)
                        for x in _KADD[curve.strategy](curve, *A, *B)]
                if guarded:
                    ok = (flat + s) < nbuck
                    vals = [[jnp.where(ok, cand[c].limbs[i], vals[c][i])
                             for i in range(n)] for c in range(3)]
                else:
                    vals = [[cand[c].limbs[i] for i in range(n)]
                            for c in range(3)]
            return vals

        vals = hs(vals, True)                      # suffix sums
        zero0 = flat == 0                          # drop bucket 0
        vals = [[jnp.where(zero0, ident[c][i], vals[c][i]) for i in range(n)]
                for c in range(3)]
        vals = hs(vals, False)                     # circular all-reduce
        for c in range(3):
            for i in range(n):
                o_ref[c, i, :, :] = vals[c][i]

    pv = pl.BlockSpec(memory_space=pltpu.VMEM)

    def run(buckets):
        out = pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct((3, n, S, 128), jnp.uint32),
            in_specs=[pv],
            out_specs=pv,
        )(buckets.reshape(3, n, S, 128))
        return out.reshape(3, n, nbuck)

    return run


@functools.lru_cache(maxsize=None)
def ladder_call(curve: CurveSpec, T: int, nw: int, B: int, block: int = 1024,
                interpret: bool = False):
    """Fused T-term Straus window ladder — the scalar_mul / ECDSA-verify
    lincomb hot loop (scalarmul.py::{scalar_mul,lincomb}) as ONE kernel.

    Per lane block: the 16-entry tables for all T terms are built in-kernel
    (15 sequential adds each, via fori_loop into VMEM scratch — the XLA path
    paid ~14 separate padd dispatches for this), then nw window steps of
    [4 doublings + T (ct-select + add)] run with the accumulator carried in
    VMEM scratch across the sequential window grid dimension. The ct select
    reads all 16 entries per term (one fori_loop) — constant-time by
    construction, like the XLA one-hot path.

    jitted (bases uint32[T, 3, n, B], digs uint32[nw, T, B]) -> [3, n, B]
    with digs MSB-window first (scalarmul.window_digits layout).
    """
    assert _supported(curve) and ladder_fits(curve, T)
    f = curve.field
    n = f.n_limbs
    assert B % 128 == 0
    block = min(block, B)
    stride = 3 * n          # tiles per table entry in the flat scratch
    # VMEM budget: the in-kernel table dominates ((T*16+4)*stride tiles of
    # [S,128] uint32). Mosaic requires sublane blocks divisible by 8, so the
    # lane block can only shrink to S=8 (1024 lanes); wide-limb multi-term
    # ladders that still exceed the budget then (p384 T=2) are rejected by
    # ladder_fits and stay on the XLA path.
    while block > 1024 and (T * 16 + 4) * stride * (block // 128) * 512 > 10 << 20:
        block //= 2
    S = block // 128
    rows = B // 128
    assert rows % S == 0
    GL = rows // S
    kadd = _KADD[curve.strategy]
    kdouble = _KDOUBLE[curve.strategy]

    def _unflat(rows_):
        return [K.kfe_from_rows(f, list(rows_[c * n:(c + 1) * n]))
                for c in range(3)]

    def _flat(fes):
        return tuple(r for fe in fes for r in fe.limbs)

    def body(base_ref, dig_ref, o_ref, tbl_ref, acc_ref):
        ci = pl.program_id(1)

        @pl.when(ci == 0)
        def _init():
            ident = _ident_rows(f, (S, 128))
            for t in range(T):
                off = t * 16 * stride
                Bse = [K.kfe_from_rows(
                    f, [base_ref[t, c, i, :, :] for i in range(n)])
                    for c in range(3)]
                rows0 = []
                for c in range(3):
                    for i in range(n):
                        tbl_ref[off + c * n + i] = ident[c][i]
                        tbl_ref[off + stride + c * n + i] = Bse[c].limbs[i]
                        rows0.append(Bse[c].limbs[i])

                def tstep(k, carry, off=off, Bse=Bse):
                    nxt = [K.ksteady(v) for v in kadd(curve, *_unflat(carry),
                                                      *Bse)]
                    flat = _flat(nxt)
                    for j, r in enumerate(flat):
                        tbl_ref[off + k * stride + j] = r
                    return flat

                jax.lax.fori_loop(2, 16, tstep, tuple(rows0))
            for c in range(3):
                for i in range(n):
                    acc_ref[c, i, :, :] = ident[c][i]

        acc = tuple(acc_ref[c, i, :, :] for c in range(3) for i in range(n))

        def dstep(_, carry):
            return _flat([K.ksteady(v) for v in kdouble(curve, *_unflat(carry))])

        acc = jax.lax.fori_loop(0, 4, dstep, acc)

        for t in range(T):
            dig = dig_ref[0, t, :, :]
            off = t * 16 * stride

            def sel_step(k, sel, dig=dig, off=off):
                m = dig == k.astype(jnp.uint32)
                base = off + k * stride
                return tuple(jnp.where(m, tbl_ref[base + j], sel[j])
                             for j in range(stride))

            ident = _ident_rows(f, (S, 128))
            sel = jax.lax.fori_loop(
                0, 16, sel_step, tuple(r for cc in ident for r in cc))
            new = _flat([K.ksteady(v)
                         for v in kadd(curve, *_unflat(acc), *_unflat(sel))])
            if T == 1:
                # bit-parity with scalarmul.scalar_mul's XLA ladder, which
                # seeds acc from the MSB window's table entry instead of
                # adding it to the identity (add(O, P) returns a Y-scaled
                # representative; a direct select keeps the exact limbs).
                first = ci == 0
                acc = tuple(jnp.where(first, sel[j], new[j])
                            for j in range(stride))
            else:
                acc = new

        for c in range(3):
            for i in range(n):
                acc_ref[c, i, :, :] = acc[c * n + i]

        @pl.when(ci == nw - 1)
        def _fin():
            for c in range(3):
                for i in range(n):
                    o_ref[c, i, :, :] = acc[c * n + i]

    bv = pl.BlockSpec((T, 3, n, S, 128), lambda l, c: (0, 0, 0, l, 0),
                      memory_space=pltpu.VMEM)
    dv = pl.BlockSpec((1, T, S, 128), lambda l, c: (c, 0, l, 0),
                      memory_space=pltpu.VMEM)
    ov = pl.BlockSpec((3, n, S, 128), lambda l, c: (0, 0, l, 0),
                      memory_space=pltpu.VMEM)

    def run(bases, digs):
        b5 = bases.reshape(T, 3, n, rows, 128)
        d4 = digs.reshape(nw, T, rows, 128)
        out = pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct((3, n, rows, 128), jnp.uint32),
            grid=(GL, nw),
            in_specs=[bv, dv],
            out_specs=ov,
            scratch_shapes=[pltpu.VMEM((T * 16 * stride, S, 128), jnp.uint32),
                            pltpu.VMEM((3, n, S, 128), jnp.uint32)],
            interpret=interpret,
        )(b5, d4)
        return out.reshape(3, n, B)

    return run


@functools.lru_cache(maxsize=None)
def genmul_call(curve: CurveSpec, nw: int, B: int, block: int = 1024,
                interpret: bool = False):
    """Fused comb fixed-base ladder — scalarmul.mul_by_generator (the ECDSA
    sign hot loop, cf. k256/src/arithmetic/mul.rs:424-439) as ONE kernel.

    Per window step: a constant-time 16-way select of the affine comb entry
    (table scalars live in SMEM; the select is 16 masked broadcasts per limb,
    no secret-indexed loads) feeds one complete mixed add (RCB Alg 5/8); the
    accumulator rides VMEM scratch across the sequential window grid dim.
    The XLA path paid one padd_mixed dispatch per window (nw total).

    jitted (tbl uint32[nw, 16, 2, n], digs uint32[nw, B]) -> [3, n, B]
    with window j LSB-first (table row j holds d * 16^j * G) matching
    scalarmul._gen_tables_np; entry 0 is the dummy masked via dig == 0.
    """
    assert _supported(curve)
    f = curve.field
    n = f.n_limbs
    assert B % 128 == 0
    block = min(block, B)
    S = block // 128
    rows = B // 128
    assert rows % S == 0
    GL = rows // S
    kadd_mixed = _KADD_MIXED[curve.strategy]

    def body(tbl_ref, dig_ref, o_ref, acc_ref):
        ci = pl.program_id(1)
        ident = _ident_rows(f, (S, 128))

        @pl.when(ci == 0)
        def _init():
            for c in range(3):
                for i in range(n):
                    acc_ref[c, i, :, :] = ident[c][i]

        dig = dig_ref[0, :, :]
        zero = jnp.zeros((S, 128), jnp.uint32)
        sel = [[zero for _ in range(n)] for _ in range(2)]
        for k in range(16):
            m = dig == np.uint32(k)
            for c in range(2):
                for i in range(n):
                    sel[c][i] = jnp.where(m, tbl_ref[0, k, c, i], sel[c][i])
        x2 = K.kfe_from_rows(f, sel[0])
        y2 = K.kfe_from_rows(f, sel[1])
        acc = [[acc_ref[c, i, :, :] for i in range(n)] for c in range(3)]
        A = [K.kfe_from_rows(f, rows_) for rows_ in acc]
        new = [K.ksteady(v) for v in kadd_mixed(curve, *A, x2, y2)]
        keep = dig == 0                           # comb entry 0 = identity
        for c in range(3):
            for i in range(n):
                acc_ref[c, i, :, :] = jnp.where(keep, acc[c][i],
                                                new[c].limbs[i])

        @pl.when(ci == nw - 1)
        def _fin():
            for c in range(3):
                for i in range(n):
                    o_ref[c, i, :, :] = acc_ref[c, i, :, :]

    tv = pl.BlockSpec((1, 16, 2, n), lambda l, c: (c, 0, 0, 0),
                      memory_space=pltpu.SMEM)
    dv = pl.BlockSpec((1, S, 128), lambda l, c: (c, l, 0),
                      memory_space=pltpu.VMEM)
    ov = pl.BlockSpec((3, n, S, 128), lambda l, c: (0, 0, l, 0),
                      memory_space=pltpu.VMEM)

    def run(tbl, digs):
        d3 = digs.reshape(nw, rows, 128)
        out = pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct((3, n, rows, 128), jnp.uint32),
            grid=(GL, nw),
            in_specs=[tv, dv],
            out_specs=ov,
            scratch_shapes=[pltpu.VMEM((3, n, S, 128), jnp.uint32)],
            interpret=interpret,
        )(tbl, d3)
        return out.reshape(3, n, B)

    return run


def padd_pallas(a: P.Point, b: P.Point, block: int = 2048) -> P.Point:
    """Fused complete point addition as one Pallas kernel over the batch.
    Batch must be 1-D with size a multiple of `block` (multiple of 128)."""
    curve = a.curve
    assert _supported(curve), "pallas kernels: solinas a0/a-3 curves only"
    (B,) = a.batch_shape
    block = min(block, B)
    fn = _padd_call(curve, B, block)
    out = fn(P.point_limbs(P.steady(a)), P.point_limbs(P.steady(b)))
    return P.point_from_limbs(curve, out)


def pdouble_pallas(a: P.Point, block: int = 2048) -> P.Point:
    curve = a.curve
    assert _supported(curve), "pallas kernels: solinas a0/a-3 curves only"
    (B,) = a.batch_shape
    block = min(block, B)
    fn = _pdouble_call(curve, B, block)
    return P.point_from_limbs(curve, fn(P.point_limbs(P.steady(a))))
