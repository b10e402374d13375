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
(Algorithms 7/9 for a = 0, 4/6 for a = -3; cf. k256/src/arithmetic/
projective.rs:96-276 and primeorder/src/point_arithmetic.rs), transcribed
onto KFE. Solinas-backend curves only (secp256k1, P-521, P-192, bign256) —
the Montgomery backend's headroom-limb dataflow stays on the XLA path.

Layout: a point batch block is uint32[3, n_limbs, S, 128] — batch lanes
split (sublane, lane) so each per-limb op is a full native VPU tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..curves.specs import CurveSpec
from . import fe_kernel as K
from . import points as P


def _b3_mul_k(curve: CurveSpec, t: K.KFE) -> K.KFE:
    b3 = (3 * curve.b) % curve.p
    if b3 < (1 << 14):
        return K.kmul_small(t, b3)
    return K.kmul(K.kfe_const(curve.field, b3, t.limbs[0].shape), t)


def _b_mul_k(curve: CurveSpec, t: K.KFE) -> K.KFE:
    if curve.b < (1 << 14):
        return K.kmul_small(t, curve.b)
    return K.kmul(K.kfe_const(curve.field, curve.b, t.limbs[0].shape), t)


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


_KADD = {"a0": _kadd_a0, "a_minus3": _kadd_am3}
_KDOUBLE = {"a0": _kdouble_a0, "a_minus3": _kdouble_am3}


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
    return curve.field.kind == "solinas" and curve.strategy in _KADD


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
