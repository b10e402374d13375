"""Pallas kernel path: correctness via interpret mode on CPU (the compiled
path is exercised on real TPU; see PERF.md)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ecc.curves.specs import get_curve
from tpu_ecc.ops import fe as F
from tpu_ecc.ops import points as P
from tpu_ecc.ops import pallas_kernels as PK
from tpu_ecc.utils import ec_host as H


@pytest.mark.slow
def test_padd_kernel_interpret(rng):
    from jax.experimental import pallas as pl

    c = get_curve("secp256k1")
    n = c.field.n_limbs
    B = 128
    ks = [rng.randrange(1, c.n) for _ in range(4)]
    pts = [H.aff_mul(c, k, H.aff_generator(c)) for k in ks]
    pa = P.from_affine_ints(c, [p_[0] for p_ in pts] * (B // 4),
                            [p_[1] for p_ in pts] * (B // 4))
    g = P.generator(c, (B,))
    a_l = P.point_limbs(P.steady(pa))
    b_l = P.point_limbs(g)

    out = pl.pallas_call(
        functools.partial(PK._padd_kernel_body, c),
        out_shape=jax.ShapeDtypeStruct((3, n, B), jnp.uint32),
        interpret=True,
    )(a_l, b_l)
    x, y, inf = jax.jit(P.to_affine)(P.point_from_limbs(c, out))
    xs, ys = F.fe_to_ints(x), F.fe_to_ints(y)
    assert not np.asarray(inf).any()
    for i in range(4):
        assert (xs[i], ys[i]) == H.aff_mul(c, ks[i] + 1, H.aff_generator(c))
