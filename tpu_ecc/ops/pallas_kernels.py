"""Pallas TPU kernels for the hot point operations.

The whole complete-addition formula (12 field muls + reduction chains) runs
inside one kernel invocation per batch block: every intermediate limb array
lives in VMEM/registers, nothing spills to HBM between field ops. The same
FE/point machinery that builds the XLA graphs traces the kernel body (with
carry chains unrolled — Mosaic has no lax.scan), so the kernels stay in
lockstep with the reference-validated formulas.

Layout: a point batch block is uint32[3, n_limbs, TB] with TB a multiple of
128 on lanes and n_limbs on sublanes.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..curves.specs import CurveSpec
from . import fe as F
from . import points as P


class _unrolled_scans:
    """Kernel-body tracing mode: unrolled carry chains + inlined constants."""

    def __enter__(self):
        self._old = (F.UNROLL_SCANS, F.PALLAS_MODE)
        F.UNROLL_SCANS = True
        F.PALLAS_MODE = True

    def __exit__(self, *a):
        F.UNROLL_SCANS, F.PALLAS_MODE = self._old


def _padd_kernel_body(curve: CurveSpec, a_ref, b_ref, o_ref):
    with _unrolled_scans():
        a = a_ref[:]
        b = b_ref[:]
        pa = P.point_from_limbs(curve, a)
        pb = P.point_from_limbs(curve, b)
        out = P.steady(P.padd(pa, pb))
        o_ref[:] = P.point_limbs(out)


def _pdouble_kernel_body(curve: CurveSpec, a_ref, o_ref):
    with _unrolled_scans():
        pa = P.point_from_limbs(curve, a_ref[:])
        o_ref[:] = P.point_limbs(P.steady(P.pdouble(pa)))


@functools.lru_cache(maxsize=None)
def _padd_call(curve: CurveSpec, batch: int, block: int):
    n = curve.field.n_limbs
    assert batch % block == 0 and block % 128 == 0
    spec = pl.BlockSpec((3, n, block), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)

    def run(a, b):
        return pl.pallas_call(
            functools.partial(_padd_kernel_body, curve),
            out_shape=jax.ShapeDtypeStruct((3, n, batch), jnp.uint32),
            grid=(batch // block,),
            in_specs=[spec, spec],
            out_specs=spec,
        )(a, b)

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _pdouble_call(curve: CurveSpec, batch: int, block: int):
    n = curve.field.n_limbs
    spec = pl.BlockSpec((3, n, block), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)

    def run(a):
        return pl.pallas_call(
            functools.partial(_pdouble_kernel_body, curve),
            out_shape=jax.ShapeDtypeStruct((3, n, batch), jnp.uint32),
            grid=(batch // block,),
            in_specs=[spec],
            out_specs=spec,
        )(a)

    return jax.jit(run)


def padd_pallas(a: P.Point, b: P.Point, block: int = 512) -> P.Point:
    """Fused complete point addition as a single Pallas kernel over the batch.
    Batch must be 1-D with size a multiple of `block` (multiple of 128)."""
    curve = a.curve
    (B,) = a.batch_shape
    block = min(block, B)
    fn = _padd_call(curve, B, block)
    out = fn(P.point_limbs(P.steady(a)), P.point_limbs(P.steady(b)))
    return P.point_from_limbs(curve, out)


def pdouble_pallas(a: P.Point, block: int = 512) -> P.Point:
    curve = a.curve
    (B,) = a.batch_shape
    block = min(block, B)
    fn = _pdouble_call(curve, B, block)
    return P.point_from_limbs(curve, fn(P.point_limbs(P.steady(a))))
