#!/usr/bin/env python3
"""CPU interpret-mode validation of pallas_kernels.ladder_call (fused Straus
window ladder): bit-equality vs the XLA scan path at tiny shapes, for T=1
(scalar_mul) and T=2 (lincomb), with short scalars to keep it fast."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np
import jax
import jax.numpy as jnp

from tpu_ecc.curves.specs import get_curve
from tpu_ecc.ops import points as P
from tpu_ecc.ops import scalarmul as SM
from tpu_ecc.ops import pallas_kernels as PK
from tpu_ecc.utils import ec_host as H


def main():
    B = 128
    bits = 16
    for name in ("secp256k1", "p192"):
        curve = get_curve(name)
        f = curve.field
        G = H.aff_generator(curve)
        rng = np.random.default_rng(3)
        base = [H.aff_mul(curve, int(k), G) for k in rng.integers(1, 2**31, 4)]
        pp = P.from_affine_ints(curve, [p[0] for p in base] * (B // 4),
                                [p[1] for p in base] * (B // 4))
        ks = [int(k) for k in rng.integers(0, 1 << bits, B)]
        k2s = [int(k) for k in rng.integers(0, 1 << bits, B)]
        k_l = SM.pack_scalars(curve, ks)
        k2_l = SM.pack_scalars(curve, k2s)
        mag, neg = SM.signed_digits(curve, k_l, bits)        # [nw, B]
        nw = mag.shape[0]

        # XLA reference: scalar_mul's fallback signed-window scan
        ref1 = P.point_limbs(P.steady(SM.scalar_mul(pp, k_l, bits)))

        bases = P.point_limbs(P.steady(pp))[None]
        out1 = PK.ladder_call(curve, 1, nw, B, interpret=True)(
            bases, mag[:, None], neg[:, None].astype(jnp.uint32))
        def affine_ints(limbs):
            from tpu_ecc.ops import fe as F
            x, y, inf = jax.jit(P.to_affine)(P.point_from_limbs(curve, limbs))
            return (F.fe_to_ints(x), F.fe_to_ints(y), np.asarray(inf).tolist())

        assert affine_ints(ref1) == affine_ints(out1), f"{name} T=1 mismatch"
        print(f"{name}: T=1 ladder kernel == XLA ({nw} windows, B={B})")

        # T=2 lincomb vs XLA lincomb (env gate: force XLA by CPU backend)
        Gb = P.generator(curve, (B,))
        ref2 = P.point_limbs(P.steady(
            SM.lincomb([(Gb, k_l), (pp, k2_l)], scalar_bits=bits)))
        sd = [SM.signed_digits(curve, k, bits) for k in (k_l, k2_l)]
        mags = jnp.stack([m for m, _ in sd], axis=1)         # [nw, 2, B]
        negs = jnp.stack([g for _, g in sd], axis=1).astype(jnp.uint32)
        bases2 = jnp.stack([P.point_limbs(P.steady(Q)) for Q in (Gb, pp)])
        out2 = PK.ladder_call(curve, 2, nw, B, interpret=True)(
            bases2, mags, negs)
        assert affine_ints(ref2) == affine_ints(out2), f"{name} T=2 mismatch"
        print(f"{name}: T=2 ladder kernel == XLA lincomb")


if __name__ == "__main__":
    main()
