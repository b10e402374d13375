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


TBL = 9   # signed-digit table size: [O, Q, .., 8Q] (digits recoded to
# [-8, 8], the reference's Radix16Decomposition — k256/src/arithmetic/
# mul.rs:274-305). Halves the ct-select traffic and table build vs 16.


def _ladder_block(curve: CurveSpec, T: int, B: int, block: int) -> int:
    """Largest lane-block sublane count S (<= block/128, dividing B/128)
    whose in-kernel tables fit the ~10MB VMEM budget; 0 if none does.
    (T*TBL+4)*3n tiles of [S,128] uint32 per block.)"""
    rows = B // 128
    S = min(max(block // 128, 1), rows)
    while S >= 1 and (rows % S or
                      (T * TBL + 4) * 3 * curve.field.n_limbs * S * 512 > 10 << 20):
        S -= 1
    return S


def ladder_fits(curve: CurveSpec, T: int, B: int = 1024) -> bool:
    """Whether ladder_call's in-kernel tables fit the VMEM budget at the
    actual lane block for batch B (block capped at 1024 lanes = S=8, the
    default). False for wide-limb many-term ladders at full block
    (p521 T>=3), which stay on the XLA lincomb path."""
    return _ladder_block(curve, T, B, 1024) >= 1


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
                 Cb: int = 8, Lb: int = 1024, interpret: bool = False,
                 signed: bool = False):
    """Fused segmented-scan kernel for the Pippenger bucket accumulation
    (parallel/msm.py): each of L lanes serially accumulates its chunk of C
    digit-sorted points, resetting on key change. The entire C-long serial
    chain runs inside Pallas with the carry in VMEM scratch across grid
    steps — the XLA formulation paid ~1.9ms per point-add step (while-loop
    carries + spills); here a step is ~4us of fused VPU work.

    jitted (key2 [C, L] uint32, val2 [C, 3, n, L] uint32) ->
      (scanned [C, 3, n, L], last_key [L], tail [3, n, L], lead [3, n, L]).
    `lead` is the scan value at each lane's LEADING-run end (the run whose
    key equals the lane's first key) — tracked in-kernel so the caller
    avoids a lane-indexed take_along_axis over the [C, 3, n, L] output
    (a minor-axis gather, ~5 ms per 2^20 window on v5e).
    signed=True adds a neg2 [C, L] input (signed-digit Pippenger): points
    whose digit was negative are y-negated IN-KERNEL before accumulation —
    register-level VPU work (kneg mirrors fe.fneg through the shared
    _sub_bias, so the kernel stays bit-equal to the XLA path), vs the
    ~15 ms/window a second payload table or a post-sort neg gather cost.
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

    def body(key_ref, val_ref, *refs):
        if signed:
            neg_ref, out_ref, lk_ref, tail_ref, lead_ref, \
                pk_ref, acc_ref, fk_ref, lead_scr = refs
        else:
            out_ref, lk_ref, tail_ref, lead_ref, \
                pk_ref, acc_ref, fk_ref, lead_scr = refs
        ci = pl.program_id(1)

        @pl.when(ci == 0)
        def _init():
            pk_ref[...] = jnp.full((S, 128), sentinel, jnp.uint32)
            fk_ref[...] = key_ref[0, :, :]
            for c in range(3):
                for i in range(n):
                    v = one_limbs[i] if c == 1 else 0  # identity (0 : 1 : 0)
                    acc_ref[c, i, :, :] = jnp.full((S, 128), np.uint32(v),
                                                   jnp.uint32)
                    lead_scr[c, i, :, :] = jnp.full((S, 128), np.uint32(v),
                                                    jnp.uint32)

        pk = pk_ref[...]
        fk = fk_ref[...]
        acc = [[acc_ref[c, i, :, :] for i in range(n)] for c in range(3)]
        for r in range(Cb):
            k = key_ref[r, :, :]
            v = [[val_ref[r, c, i, :, :] for i in range(n)] for c in range(3)]
            if signed:
                ng = neg_ref[r, :, :] != 0
                yn = K.ksteady(K.kneg(K.kfe_from_rows(f, v[1])))
                v[1] = [jnp.where(ng, yn.limbs[i], v[1][i]) for i in range(n)]
            A = [K.kfe_from_rows(f, rows) for rows in acc]
            V = [K.kfe_from_rows(f, rows) for rows in v]
            cand = [K.ksteady(x) for x in _KADD[curve.strategy](curve, *A, *V)]
            same = k == pk
            acc = [[jnp.where(same, cand[c].limbs[i], v[c][i])
                    for i in range(n)] for c in range(3)]
            is_lead = k == fk      # monotone keys: last update = run end
            for c in range(3):
                for i in range(n):
                    out_ref[r, c, i, :, :] = acc[c][i]
                    lead_scr[c, i, :, :] = jnp.where(
                        is_lead, acc[c][i], lead_scr[c, i, :, :])
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
                    lead_ref[c, i, :, :] = lead_scr[c, i, :, :]

    kv = pl.BlockSpec((Cb, S, 128), lambda l, c: (c, l, 0),
                      memory_space=pltpu.VMEM)
    vv = pl.BlockSpec((Cb, 3, n, S, 128), lambda l, c: (c, 0, 0, l, 0),
                      memory_space=pltpu.VMEM)
    ov = pl.BlockSpec((Cb, 3, n, S, 128), lambda l, c: (c, 0, 0, l, 0),
                      memory_space=pltpu.VMEM)
    lkv = pl.BlockSpec((S, 128), lambda l, c: (l, 0), memory_space=pltpu.VMEM)
    tv = pl.BlockSpec((3, n, S, 128), lambda l, c: (0, 0, l, 0),
                      memory_space=pltpu.VMEM)

    def run(key2, val2, neg2=None):
        k4 = key2.reshape(C, rowsL, 128)
        v5 = val2.reshape(C, 3, n, rowsL, 128)
        ins = [k4, v5]
        in_specs = [kv, vv]
        if signed:
            ins.append(neg2.reshape(C, rowsL, 128))
            in_specs.append(kv)
        scanned, lk, tail, lead = pl.pallas_call(
            body,
            out_shape=(jax.ShapeDtypeStruct((C, 3, n, rowsL, 128), jnp.uint32),
                       jax.ShapeDtypeStruct((rowsL, 128), jnp.uint32),
                       jax.ShapeDtypeStruct((3, n, rowsL, 128), jnp.uint32),
                       jax.ShapeDtypeStruct((3, n, rowsL, 128), jnp.uint32)),
            grid=(GL, GC),
            in_specs=in_specs,
            out_specs=(ov, lkv, tv, tv),
            scratch_shapes=[pltpu.VMEM((S, 128), jnp.uint32),
                            pltpu.VMEM((3, n, S, 128), jnp.uint32),
                            pltpu.VMEM((S, 128), jnp.uint32),
                            pltpu.VMEM((3, n, S, 128), jnp.uint32)],
            interpret=interpret,
        )(*ins)
        return (scanned.reshape(C, 3, n, L), lk.reshape(L),
                tail.reshape(3, n, L), lead.reshape(3, n, L))

    return run


def _ident_rows(f, shape):
    from ..utils.bigint import int_to_limbs

    one = int_to_limbs(f.encode_int(1), f.n_limbs, f.limb_bits)
    return [[jnp.full(shape, np.uint32(one[i] if c == 1 else 0), jnp.uint32)
             for i in range(f.n_limbs)] for c in range(3)]


def _shift_flat_dyn(x, s, forward: bool):
    """_shift_flat with a TRACED shift amount (pltpu.roll supports dynamic
    shifts): forward=True -> y[j] = x[j+s] over the flattened S*128 index.
    The r == 0 sub-case falls out of the lane select (b is never chosen).

    Small-S sublane rolls (S <= 4) are emitted as a select chain of STATIC
    rolls: the Mosaic remote compiler crashes (tpu_compile_helper exit 1)
    on dynamic sublane rolls of tiny axes — only small TEST shapes hit
    this (production L=8192 -> S=64); S == 1 elides the roll entirely (a
    roll of a size-1 axis is the identity for any shift)."""
    S = x.shape[0]

    def roll0(v, amt):
        # amt: traced, already reduced mod S
        if S == 1:
            return v
        if S <= 4:
            out = v
            for t in range(1, S):
                out = jnp.where(amt == np.uint32(t),
                                pltpu.roll(v, t, axis=0), out)
            return out
        return pltpu.roll(v, amt, axis=0)

    q = s >> np.uint32(7)
    r = s & np.uint32(127)
    lane = jax.lax.broadcasted_iota(jnp.uint32, (S, 128), 1)
    if forward:
        z = roll0(x, (np.uint32(S) - q) % np.uint32(S))
        a = pltpu.roll(z, (np.uint32(128) - r) % np.uint32(128), axis=1)
        b = a if S == 1 else pltpu.roll(a, S - 1, axis=0)
        return jnp.where(lane < np.uint32(128) - r, a, b)
    z = roll0(x, q)
    a = pltpu.roll(z, r, axis=1)
    b = a if S == 1 else pltpu.roll(a, 1, axis=0)
    return jnp.where(lane >= r, a, b)


@functools.lru_cache(maxsize=None)
def fixup_call(curve: CurveSpec, L: int, interpret: bool = False):
    """Fused Pippenger lane fix-up (parallel/msm.py step 4+5): segmented
    Hillis-Steele over the L per-lane tail sums (keyed on last_key, monotone)
    followed by the carry select and the leading-run correction padd.

    GRID-STEPPED: the log2(L) scan steps are a sequential grid dimension
    with the shift amount computed from program_id and applied via dynamic
    pltpu.roll — the kernel body holds ONE point add (plus the final carry
    add), so it compiles like a single padd kernel instead of the round-2
    version's 14-add unroll (whose Mosaic remote compile took ~16 min at
    L=8192; this is why the fused MSM path can now default on).

    jitted (t_l [3,n,L], last_key [L], first_key [L], lead_vals [3,n,L])
      -> fixed [3, n, L]
    """
    assert _supported(curve)
    f = curve.field
    n = f.n_limbs
    assert L % 128 == 0
    S = L // 128
    nsteps = max(L.bit_length() - 1, 0)

    def body(t_ref, lk_ref, fk_ref, lv_ref, o_ref, acc_ref):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _init():
            acc_ref[...] = t_ref[...]

        lk = lk_ref[...]
        flat = (jax.lax.broadcasted_iota(jnp.uint32, (S, 128), 0)
                * np.uint32(128)
                + jax.lax.broadcasted_iota(jnp.uint32, (S, 128), 1))
        s = jnp.uint32(1) << k.astype(jnp.uint32)
        vals = [[acc_ref[c, i, :, :] for i in range(n)] for c in range(3)]
        rolled = [[_shift_flat_dyn(vals[c][i], s, False) for i in range(n)]
                  for c in range(3)]
        A = [K.kfe_from_rows(f, vals[c]) for c in range(3)]
        B = [K.kfe_from_rows(f, rolled[c]) for c in range(3)]
        cand = [K.ksteady(x) for x in _KADD[curve.strategy](curve, *A, *B)]
        ok = (_shift_flat_dyn(lk, s, False) == lk) & (flat >= s)
        for c in range(3):
            for i in range(n):
                acc_ref[c, i, :, :] = jnp.where(ok, cand[c].limbs[i],
                                                vals[c][i])

        @pl.when(k == nsteps - 1)
        def _fin():
            # carry = T_incl[l-1] if first_key[l] == last_key[l-1] else O
            one = np.uint32(1)
            carry_ok = ((fk_ref[...] == _shift_flat_dyn(lk, one, False))
                        & (flat >= one))
            ident = _ident_rows(f, (S, 128))
            carry = [[jnp.where(carry_ok,
                                _shift_flat_dyn(acc_ref[c, i, :, :], one,
                                                False),
                                ident[c][i]) for i in range(n)]
                     for c in range(3)]
            LV = [K.kfe_from_rows(f, [lv_ref[c, i, :, :] for i in range(n)])
                  for c in range(3)]
            CA = [K.kfe_from_rows(f, carry[c]) for c in range(3)]
            out = [K.ksteady(x)
                   for x in _KADD[curve.strategy](curve, *LV, *CA)]
            for c in range(3):
                for i in range(n):
                    o_ref[c, i, :, :] = out[c].limbs[i]

    pv = pl.BlockSpec(memory_space=pltpu.VMEM)

    def run(t_l, last_key, first_key, lead_vals):
        out = pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct((3, n, S, 128), jnp.uint32),
            grid=(max(nsteps, 1),),
            in_specs=[pv, pv, pv, pv],
            out_specs=pv,
            scratch_shapes=[pltpu.VMEM((3, n, S, 128), jnp.uint32)],
            interpret=interpret,
        )(t_l.reshape(3, n, S, 128), last_key.reshape(S, 128),
          first_key.reshape(S, 128), lead_vals.reshape(3, n, S, 128))
        return out.reshape(3, n, L)

    return run


@functools.lru_cache(maxsize=None)
def bucket_reduce_call(curve: CurveSpec, nbuck: int, interpret: bool = False,
                       drop0: bool = True):
    """Fused Pippenger bucket reduction (parallel/msm.py step 8):
    sum_b b*S_b = sum_{b>=1} suffix_b via a guarded suffix Hillis-Steele then
    a circular all-reduce. GRID-STEPPED like fixup_call: 2*log2(nbuck)
    sequential grid steps, ONE point add per body (see fixup_call's note on
    compile cost).

    drop0=False keeps bucket 0 in the final sum (signed-digit mode, where
    bucket b holds |digit| = b+1 and the weighted sum is sum_b (b+1)*S_b =
    the sum of ALL suffixes).

    jitted (buckets [3, n, nbuck]) -> S [3, n] packed as [3, n, nbuck]
    (every flat lane holds the total; the caller takes lane 0).
    """
    assert _supported(curve)
    f = curve.field
    n = f.n_limbs
    assert nbuck % 128 == 0
    S = nbuck // 128
    nsteps = nbuck.bit_length() - 1

    def body(b_ref, o_ref, acc_ref):
        k = pl.program_id(0)
        flat = (jax.lax.broadcasted_iota(jnp.uint32, (S, 128), 0)
                * np.uint32(128)
                + jax.lax.broadcasted_iota(jnp.uint32, (S, 128), 1))

        @pl.when(k == 0)
        def _init():
            acc_ref[...] = b_ref[...]

        if drop0:
            @pl.when(k == nsteps)
            def _drop0():
                # between phases: drop bucket 0 before the circular all-reduce
                ident = _ident_rows(f, (S, 128))
                zero0 = flat == 0
                for c in range(3):
                    for i in range(n):
                        acc_ref[c, i, :, :] = jnp.where(
                            zero0, ident[c][i], acc_ref[c, i, :, :])

        suffix = k < nsteps
        sk = jnp.where(suffix, k, k - nsteps).astype(jnp.uint32)
        s = jnp.uint32(1) << sk
        vals = [[acc_ref[c, i, :, :] for i in range(n)] for c in range(3)]
        rolled = [[_shift_flat_dyn(vals[c][i], s, True) for i in range(n)]
                  for c in range(3)]
        A = [K.kfe_from_rows(f, vals[c]) for c in range(3)]
        B = [K.kfe_from_rows(f, rolled[c]) for c in range(3)]
        cand = [K.ksteady(x) for x in _KADD[curve.strategy](curve, *A, *B)]
        ok = jnp.logical_or(jnp.logical_not(suffix),
                            (flat + s) < np.uint32(nbuck))
        for c in range(3):
            for i in range(n):
                acc_ref[c, i, :, :] = jnp.where(ok, cand[c].limbs[i],
                                                vals[c][i])

        @pl.when(k == 2 * nsteps - 1)
        def _fin():
            o_ref[...] = acc_ref[...]

    pv = pl.BlockSpec(memory_space=pltpu.VMEM)

    def run(buckets):
        out = pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct((3, n, S, 128), jnp.uint32),
            grid=(2 * nsteps,),
            in_specs=[pv],
            out_specs=pv,
            scratch_shapes=[pltpu.VMEM((3, n, S, 128), jnp.uint32)],
            interpret=interpret,
        )(buckets.reshape(3, n, S, 128))
        return out.reshape(3, n, nbuck)

    return run


@functools.lru_cache(maxsize=None)
def horner_call(curve: CurveSpec, w: int, nw: int, interpret: bool = False):
    """Fused Pippenger window combine: acc = 2^w * acc + S_j over the nw
    per-window sums, MSB window first (parallel/msm.py step 9). One grid
    step per window, each w doublings + 1 add on a single [8, 128] tile
    block (the values are broadcast across the tile; the caller reads lane
    0). Replaces nw*(w+1) single-point XLA ops whose per-op dispatch
    dominated the MSM tail.

    jitted (S_all uint32[nw, 3, n, 8, 128]) -> [3, n, 8, 128]
    """
    assert _supported(curve)
    f = curve.field
    n = f.n_limbs
    kadd = _KADD[curve.strategy]
    kdouble = _KDOUBLE[curve.strategy]

    def body(s_ref, o_ref, acc_ref):
        ci = pl.program_id(0)
        ident = _ident_rows(f, (8, 128))

        @pl.when(ci == 0)
        def _init():
            for c in range(3):
                for i in range(n):
                    acc_ref[c, i, :, :] = ident[c][i]

        acc = tuple(acc_ref[c, i, :, :] for c in range(3) for i in range(n))

        def _unflat(rows_):
            return [K.kfe_from_rows(f, list(rows_[c * n:(c + 1) * n]))
                    for c in range(3)]

        def _flat(fes):
            return tuple(r for fe in fes for r in fe.limbs)

        def dstep(_, carry):
            return _flat([K.ksteady(v)
                          for v in kdouble(curve, *_unflat(carry))])

        acc = jax.lax.fori_loop(0, w, dstep, acc)
        Sw = [K.kfe_from_rows(f, [s_ref[0, c, i, :, :] for i in range(n)])
              for c in range(3)]
        acc = _flat([K.ksteady(v)
                     for v in kadd(curve, *_unflat(acc), *Sw)])
        for c in range(3):
            for i in range(n):
                acc_ref[c, i, :, :] = acc[c * n + i]

        @pl.when(ci == nw - 1)
        def _fin():
            for c in range(3):
                for i in range(n):
                    o_ref[c, i, :, :] = acc[c * n + i]

    sv = pl.BlockSpec((1, 3, n, 8, 128), lambda c: (c, 0, 0, 0, 0),
                      memory_space=pltpu.VMEM)
    ov = pl.BlockSpec(memory_space=pltpu.VMEM)

    def run(s_all):
        return pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct((3, n, 8, 128), jnp.uint32),
            grid=(nw,),
            in_specs=[sv],
            out_specs=ov,
            scratch_shapes=[pltpu.VMEM((3, n, 8, 128), jnp.uint32)],
            interpret=interpret,
        )(s_all)

    return run


@functools.lru_cache(maxsize=None)
def ladder_call(curve: CurveSpec, T: int, nw: int, B: int, block: int = 1024,
                glv: bool = False, interpret: bool = False):
    """Fused signed-digit Straus window ladder — the scalar_mul / ECDSA-verify
    lincomb hot loop (scalarmul.py::{scalar_mul,lincomb,lincomb_glv}) as ONE
    kernel.

    Digits are recoded to signed [-8, 8] windows (scalarmul.signed_digits,
    the reference's Radix16Decomposition, k256/src/arithmetic/mul.rs:274-305),
    so each base needs only a 9-entry table [O, Q, .., 8Q] — built in-kernel
    with 7 sequential adds per block — and the constant-time select reads 9
    entries instead of 16; the digit sign conditionally negates the selected
    y (masked, no branches). The accumulator rides VMEM scratch across the
    sequential window grid dimension.

    With glv=True the H = 2T half-scalar terms share the T base tables
    through the curve endomorphism (k256 lincomb, mul.rs:342-393): term 2t
    selects from table t directly, term 2t+1 applies psi(x, y) = (beta*x, y)
    post-select (one field mul). The per-window neg masks already fold the
    half sign with the digit sign (computed by scalarmul.lincomb_glv).

    jitted (bases uint32[T, 3, n, B], mag uint32[nw, H, B],
            neg uint32[nw, H, B]) -> [3, n, B], windows MSB first,
    H = 2T if glv else T.
    """
    assert _supported(curve)
    assert not glv or curve.glv
    f = curve.field
    n = f.n_limbs
    assert B % 128 == 0
    stride = 3 * n          # tiles per table entry in the flat scratch
    # VMEM budget: the in-kernel table dominates ((T*TBL+4)*stride tiles of
    # [S,128] uint32); _ladder_block picks the largest lane block (dividing
    # the batch) that fits ~10MB. Ladders no block fits (p521 T>=3 at any S)
    # are rejected by ladder_fits and stay on the XLA path.
    S = _ladder_block(curve, T, B, block)
    assert S >= 1, "in-kernel tables exceed the VMEM budget at any block"
    rows = B // 128
    GL = rows // S
    H = 2 * T if glv else T
    kadd = _KADD[curve.strategy]
    kdouble = _KDOUBLE[curve.strategy]
    beta_i = curve.glv["beta"] if glv else 0

    def _unflat(rows_):
        return [K.kfe_from_rows(f, list(rows_[c * n:(c + 1) * n]))
                for c in range(3)]

    def _flat(fes):
        return tuple(r for fe in fes for r in fe.limbs)

    def body(base_ref, mag_ref, neg_ref, o_ref, tbl_ref, acc_ref):
        ci = pl.program_id(1)

        @pl.when(ci == 0)
        def _init():
            ident = _ident_rows(f, (S, 128))
            for t in range(T):
                off = t * TBL * stride
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

                jax.lax.fori_loop(2, TBL, tstep, tuple(rows0))
            for c in range(3):
                for i in range(n):
                    acc_ref[c, i, :, :] = ident[c][i]

        acc = tuple(acc_ref[c, i, :, :] for c in range(3) for i in range(n))

        def dstep(_, carry):
            return _flat([K.ksteady(v) for v in kdouble(curve, *_unflat(carry))])

        acc = jax.lax.fori_loop(0, 4, dstep, acc)
        ident = _ident_rows(f, (S, 128))
        beta_c = K.kfe_const(f, beta_i, (S, 128)) if glv else None

        for h in range(H):
            t, endo_f = (h // 2, h % 2) if glv else (h, 0)
            mag = mag_ref[0, h, :, :]
            off = t * TBL * stride

            def sel_step(k, sel, mag=mag, off=off):
                m = mag == k.astype(jnp.uint32)
                base = off + k * stride
                return tuple(jnp.where(m, tbl_ref[base + j], sel[j])
                             for j in range(stride))

            sel = jax.lax.fori_loop(
                0, TBL, sel_step, tuple(r for cc in ident for r in cc))
            X, Y, Z = _unflat(sel)
            if endo_f:
                X = K.kmul(beta_c, X)
            negm = neg_ref[0, h, :, :] != 0
            Yn = K.ksteady(K.kneg(Y))
            Y = K.kfe_from_rows(
                f, [jnp.where(negm, a, b) for a, b in zip(Yn.limbs, Y.limbs)])
            new = _flat([K.ksteady(v)
                         for v in kadd(curve, *_unflat(acc), X, Y, Z)])
            if H == 1:
                # bit-parity with scalarmul.scalar_mul's XLA ladder, which
                # seeds acc from the MSB window's (sign-folded) table entry
                # instead of adding it to the identity (add(O, P) returns a
                # Y-scaled representative; a direct select keeps the limbs).
                first = ci == 0
                sel_s = _flat([X, Y, Z])
                acc = tuple(jnp.where(first, sel_s[j], new[j])
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
    dv = pl.BlockSpec((1, H, S, 128), lambda l, c: (c, 0, l, 0),
                      memory_space=pltpu.VMEM)
    ov = pl.BlockSpec((3, n, S, 128), lambda l, c: (0, 0, l, 0),
                      memory_space=pltpu.VMEM)

    def run(bases, mag, neg):
        b5 = bases.reshape(T, 3, n, rows, 128)
        m4 = mag.reshape(nw, H, rows, 128)
        g4 = neg.reshape(nw, H, rows, 128)
        out = pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct((3, n, rows, 128), jnp.uint32),
            grid=(GL, nw),
            in_specs=[bv, dv, dv],
            out_specs=ov,
            scratch_shapes=[pltpu.VMEM((T * TBL * stride, S, 128), jnp.uint32),
                            pltpu.VMEM((3, n, S, 128), jnp.uint32)],
            interpret=interpret,
        )(b5, m4, g4)
        return out.reshape(3, n, B)

    return run


@functools.lru_cache(maxsize=None)
def genmul_call(curve: CurveSpec, nw: int, B: int, block: int = 1024,
                interpret: bool = False):
    """Fused comb fixed-base ladder — scalarmul.mul_by_generator (the ECDSA
    sign hot loop, cf. k256/src/arithmetic/mul.rs:424-439) as ONE kernel.

    Per window step: a constant-time 9-way select of the signed affine comb
    entry (Radix16 signed digits — table scalars live in SMEM; the select is
    9 masked broadcasts per limb, no secret-indexed loads), a conditional y
    negation, then one complete mixed add (RCB Alg 5/8); the accumulator
    rides VMEM scratch across the sequential window grid dim. The XLA path
    paid one padd_mixed dispatch per window (nw total).

    jitted (tbl uint32[nw, 9, 2, n], mag uint32[nw, B], neg uint32[nw, B])
    -> [3, n, B] with window j LSB-first (table row j holds d * 16^j * G)
    matching scalarmul._gen_tables_np; entry 0 is the dummy masked via
    mag == 0.
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

    def body(tbl_ref, dig_ref, neg_ref, o_ref, acc_ref):
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
        for k in range(TBL):
            m = dig == np.uint32(k)
            for c in range(2):
                for i in range(n):
                    sel[c][i] = jnp.where(m, tbl_ref[0, k, c, i], sel[c][i])
        x2 = K.kfe_from_rows(f, sel[0])
        y2 = K.kfe_from_rows(f, sel[1])
        negm = neg_ref[0, :, :] != 0
        y2n = K.ksteady(K.kneg(y2))
        y2 = K.kfe_from_rows(
            f, [jnp.where(negm, a, b) for a, b in zip(y2n.limbs, y2.limbs)])
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

    tv = pl.BlockSpec((1, TBL, 2, n), lambda l, c: (c, 0, 0, 0),
                      memory_space=pltpu.SMEM)
    dv = pl.BlockSpec((1, S, 128), lambda l, c: (c, l, 0),
                      memory_space=pltpu.VMEM)
    ov = pl.BlockSpec((3, n, S, 128), lambda l, c: (0, 0, l, 0),
                      memory_space=pltpu.VMEM)

    def run(tbl, mag, neg):
        m3 = mag.reshape(nw, rows, 128)
        g3 = neg.reshape(nw, rows, 128)
        out = pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct((3, n, rows, 128), jnp.uint32),
            grid=(GL, nw),
            in_specs=[tv, dv, dv],
            out_specs=ov,
            scratch_shapes=[pltpu.VMEM((3, n, S, 128), jnp.uint32)],
            interpret=interpret,
        )(tbl, m3, g3)
        return out.reshape(3, n, B)

    return run


@functools.lru_cache(maxsize=None)
def pow_call(spec, e: int, B: int, block: int = 1024,
             interpret: bool = False):
    """Fused fixed-exponent power x^e — fe.fpow_const's 4-bit-window chain
    (Fermat inversion x^(p-2), sqrt exponent chains — cf. the reference's
    unrolled addition chains, k256/src/arithmetic/field.rs:187-216) as ONE
    kernel.

    Grid step ci = one exponent window: acc <- acc^16 * tbl[digit]. The
    15-entry table [x .. x^15] lives in VMEM scratch (built once per lane
    block with 14 kmuls); the public exponent digits stream through SMEM,
    MSB first, so the per-step select is a scalar-predicated masked copy
    (the exponent is a host constant — no secret-dependent control flow to
    protect). The accumulator rides VMEM scratch across the sequential
    window grid dimension, so the ~(4*ndig) squarings + ndig muls never
    spill limbs to HBM — the XLA fpow_const path pays an HBM round trip
    per scan step and dominated the ECDSA sign/verify device cores.

    jitted (x uint32[n, B] steady limbs) -> uint32[n, B] steady limbs.
    Works for any solinas/mont FieldSpec (base and scalar fields).
    """
    assert spec.kind in ("solinas", "mont")
    import math

    n = spec.n_limbs
    assert B % 128 == 0 and e >= 2
    rows = B // 128
    # largest sublane count <= block/128 that divides the row count, so any
    # B % 128 == 0 batch is accepted (ADVICE r3: B=1152 must not assert)
    S = math.gcd(rows, block // 128)
    GL = rows // S
    ndig = -(-e.bit_length() // 4)
    digits = np.array([(e >> (4 * i)) & 15 for i in range(ndig)][::-1],
                      np.uint32)

    def body(x_ref, dig_ref, o_ref, tbl_ref, acc_ref):
        ci = pl.program_id(1)

        @pl.when(ci == 0)
        def _init():
            x = K.kfe_from_rows(spec, [x_ref[i, :, :] for i in range(n)])
            cur = x
            for i, r in enumerate(cur.limbs):
                tbl_ref[i] = r
            for k in range(2, 16):          # tbl[k-1] = x^k
                cur = K.ksteady(K.kmul(cur, x))
                for i, r in enumerate(cur.limbs):
                    tbl_ref[(k - 1) * n + i] = r
            one = K.kfe_const(spec, 1, (S, 128))
            for i in range(n):
                acc_ref[i] = jnp.broadcast_to(one.limbs[i], (S, 128))

        acc = K.kfe_from_rows(spec, [acc_ref[i] for i in range(n)])
        for _ in range(4):
            acc = K.ksteady(K.ksquare(acc))
        dig = dig_ref[0, 0, 0]
        zero = jnp.zeros((S, 128), jnp.uint32)
        sel = [zero] * n
        for k in range(1, 16):
            m = dig == np.uint32(k)
            sel = [jnp.where(m, tbl_ref[(k - 1) * n + i], sv)
                   for i, sv in enumerate(sel)]
        term = K.kfe_from_rows(spec, sel)
        new = K.ksteady(K.kmul(acc, term))
        keep = dig == 0                     # x^(16a+0) = (x^a)^16: skip mul
        for i in range(n):
            acc_ref[i] = jnp.where(keep, acc.limbs[i], new.limbs[i])

        @pl.when(ci == ndig - 1)
        def _fin():
            for i in range(n):
                o_ref[i, :, :] = acc_ref[i]

    xv = pl.BlockSpec((n, S, 128), lambda l, c: (0, l, 0),
                      memory_space=pltpu.VMEM)
    dv = pl.BlockSpec((1, 1, 1), lambda l, c: (c, 0, 0),
                      memory_space=pltpu.SMEM)
    ov = pl.BlockSpec((n, S, 128), lambda l, c: (0, l, 0),
                      memory_space=pltpu.VMEM)
    # plain numpy: pow_call is lru-cached, and a jnp constant materialized
    # inside one jit trace would leak into the next trace that hits the cache
    dig2 = digits.reshape(ndig, 1, 1)

    def run(x):
        x3 = x.reshape(n, rows, 128)
        out = pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct((n, rows, 128), jnp.uint32),
            grid=(GL, ndig),
            in_specs=[xv, dv],
            out_specs=ov,
            scratch_shapes=[pltpu.VMEM((15 * n, S, 128), jnp.uint32),
                            pltpu.VMEM((n, S, 128), jnp.uint32)],
            interpret=interpret,
        )(x3, dig2)
        return out.reshape(n, B)

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
