"""tpu-ecc: TPU-native elliptic-curve cryptography (JAX/XLA/Pallas).

A from-scratch framework with the capabilities of RustCrypto's
elliptic-curves workspace (risc0 fork): 12 short-Weierstrass curves, batched
constant-time field/point/scalar kernels, ECDSA/ECDH/Schnorr/SM2/bign
protocols, SEC1/DER/PKCS#8/JWK codecs, and mesh-sharded MSM.

Quick start:

    from tpu_ecc import get_curve, ecdsa
    sigs = ecdsa.sign_batch(get_curve("p256"), d_list, z_list)
"""

from .curves.specs import CurveSpec, get_curve, list_curves          # noqa: F401
from .ops import fe, points, scalarmul                               # noqa: F401
from .ops.fe import FE, FieldSpec                                    # noqa: F401
from .ops.points import Point                                        # noqa: F401

__version__ = "0.1.0"


def __getattr__(name):
    # lazy protocol/parallel imports (they pull in jax-compiled machinery)
    if name in ("ecdsa", "ecdh", "schnorr", "sm2", "bign", "hash2curve",
                "rfc6979", "belt"):
        import importlib

        return importlib.import_module(f".protocols.{name}", __name__)
    if name in ("msm", "collectives"):
        import importlib

        return importlib.import_module(f".parallel.{name}", __name__)
    if name in ("sec1", "der", "keys", "asn1"):
        import importlib

        return importlib.import_module(f".encoding.{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
