"""Curve registry: every curve of the reference workspace, as static specs.

All constants are the published standard curve parameters, cross-checked against
the reference crates (see per-curve citations). The per-curve point-arithmetic
strategy replaces the reference's `PointArithmetic` trait dispatch
(primeorder/src/point_arithmetic.rs); limb plans replace its per-target `cfg`
backend selection (k256/src/arithmetic/field.rs:7-36).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

from ..ops.fe import FieldSpec, make_field_spec


@dataclasses.dataclass(frozen=True, eq=False)
class CurveSpec:
    name: str
    field: FieldSpec          # base field F_p
    scalar: FieldSpec         # scalar field F_n (n = group order)
    a: int                    # curve coefficient a (canonical int)
    b: int                    # curve coefficient b
    gx: int
    gy: int
    h: int = 1                # cofactor (1 for all supported curves)
    oid: str = ""
    # point formula strategy: 'a0' (k256-specialized), 'a_minus3', 'generic'
    strategy: str = "generic"
    # GLV endomorphism (k256): beta (field), lambda (scalar), decomposition consts
    glv: Optional[dict] = None
    # VOPRF ciphersuite (RFC 9497): (suite id, hash name) — the reference's
    # VoprfParameters impls (p256/src/lib.rs:176-183, p384/src/lib.rs:129-135,
    # p521/src/lib.rs:113-119)
    voprf: Optional[tuple] = None

    def __hash__(self):
        return id(self)

    def __repr__(self):
        return f"CurveSpec({self.name})"

    @property
    def p(self) -> int:
        return self.field.p

    @property
    def n(self) -> int:
        return self.scalar.p

    @property
    def field_bytes(self) -> int:
        return (self.field.bits + 7) // 8

    @property
    def scalar_bytes(self) -> int:
        return (self.scalar.bits + 7) // 8


def _strategy(a: int, p: int) -> str:
    if a == 0:
        return "a0"
    if a == p - 3:
        return "a_minus3"
    return "generic"


def _curve(name, p, n, a, b, gx, gy, oid="", field_kind=None, glv=None,
           voprf=None) -> CurveSpec:
    field = make_field_spec(f"{name}.fp", p, kind=field_kind)
    scalar = make_field_spec(f"{name}.fn", n, kind="mont")
    a %= p
    return CurveSpec(
        name=name, field=field, scalar=scalar, a=a, b=b % p, gx=gx, gy=gy,
        oid=oid, strategy=_strategy(a, p), glv=glv, voprf=voprf,
    )


@functools.lru_cache(maxsize=None)
def get_curve(name: str) -> CurveSpec:
    return _REGISTRY[name]()


def list_curves() -> list[str]:
    return sorted(_REGISTRY)


# ---------------------------------------------------------------------------
# secp256k1 — reference: k256/src/lib.rs:76-103, k256/src/arithmetic/
# ---------------------------------------------------------------------------

def _secp256k1() -> CurveSpec:
    p = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F
    n = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
    # GLV endomorphism constants (k256/src/arithmetic/mul.rs:129-268):
    # beta: cube root of unity in F_p; lambda: matching root in F_n.
    beta = 0x7AE96A2B657C07106E64479EAC3434E99CF0497512F58995C1396C28719501EE
    lam = 0x5363AD4CC05C30E0A5261C028812645A122E22EA20816678DF02967C1B23BD72
    glv = dict(
        beta=beta,
        lam=lam,
        # |a1|,|b1|,|a2|,|b2| lattice basis for the balanced decomposition
        # k = k1 + k2*lambda with |k1|,|k2| ~ sqrt(n)
        a1=0x3086D221A7D46BCDE86C90E49284EB15,
        b1=-0xE4437ED6010E88286F547FA90ABFE4C3,
        a2=0x114CA50F7A8E2F3F657C1108D9D44CFD8,
        b2=0x3086D221A7D46BCDE86C90E49284EB15,
    )
    return _curve(
        "secp256k1", p, n, 0, 7,
        0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798,
        0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8,
        oid="1.3.132.0.10", field_kind="solinas", glv=glv,
    )


# ---------------------------------------------------------------------------
# NIST P-192/224/256/384/521 — reference: p192/p224/p256/p384/p521 crates
# ---------------------------------------------------------------------------

def _p192() -> CurveSpec:
    p = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFFFFFFFFFFFF
    n = 0xFFFFFFFFFFFFFFFFFFFFFFFF99DEF836146BC9B1B4D22831
    return _curve(
        "p192", p, n, -3,
        0x64210519E59C80E70FA7E9AB72243049FEB8DEECC146B9B1,
        0x188DA80EB03090F67CBF20EB43A18800F4FF0AFD82FF1012,
        0x07192B95FFC8DA78631011ED6B24CDD573F977A11E794811,
        oid="1.2.840.10045.3.1.1", field_kind="solinas",
    )


def _p224() -> CurveSpec:
    p = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFF000000000000000000000001
    n = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFF16A2E0B8F03E13DD29455C5C2A3D
    return _curve(
        "p224", p, n, -3,
        0xB4050A850C04B3ABF54132565044B0B7D7BFD8BA270B39432355FFB4,
        0xB70E0CBD6BB4BF7F321390B94A03C1D356C21122343280D6115C1D21,
        0xBD376388B5F723FB4C22DFE6CD4375A05A07476444D5819985007E34,
        oid="1.3.132.0.33", field_kind="mont",
    )


def _p256() -> CurveSpec:
    p = 0xFFFFFFFF00000001000000000000000000000000FFFFFFFFFFFFFFFFFFFFFFFF
    n = 0xFFFFFFFF00000000FFFFFFFFFFFFFFFFBCE6FAADA7179E84F3B9CAC2FC632551
    return _curve(
        "p256", p, n, -3,
        0x5AC635D8AA3A93E7B3EBBD55769886BC651D06B0CC53B0F63BCE3C3E27D2604B,
        0x6B17D1F2E12C4247F8BCE6E563A440F277037D812DEB33A0F4A13945D898C296,
        0x4FE342E2FE1A7F9B8EE7EB4A7C0F9E162BCE33576B315ECECBB6406837BF51F5,
        oid="1.2.840.10045.3.1.7", field_kind="mont",
        voprf=("P256-SHA256", "sha256"),
    )


def _p384() -> CurveSpec:
    p = int(
        "fffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffe"
        "ffffffff0000000000000000ffffffff", 16)
    n = int(
        "ffffffffffffffffffffffffffffffffffffffffffffffffc7634d81f4372ddf"
        "581a0db248b0a77aecec196accc52973", 16)
    return _curve(
        "p384", p, n, -3,
        int("b3312fa7e23ee7e4988e056be3f82d19181d9c6efe8141120314088f5013875a"
            "c656398d8a2ed19d2a85c8edd3ec2aef", 16),
        int("aa87ca22be8b05378eb1c71ef320ad746e1d3b628ba79b9859f741e082542a38"
            "5502f25dbf55296c3a545e3872760ab7", 16),
        int("3617de4a96262c6f5d9e98bf9292dc29f8f41dbd289a147ce9da3113b5f0b8c0"
            "0a60b1ce1d7e819d7a431d7c90ea0e5f", 16),
        oid="1.3.132.0.34", field_kind="mont",
        voprf=("P384-SHA384", "sha384"),
    )


def _p521() -> CurveSpec:
    p = (1 << 521) - 1
    n = int(
        "1fffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff"
        "ffa51868783bf2f966b7fcc0148f709a5d03bb5c9b8899c47aebb6fb71e91386"
        "409", 16)
    return _curve(
        "p521", p, n, -3,
        int("0051953eb9618e1c9a1f929a21a0b68540eea2da725b99b315f3b8b489918ef1"
            "09e156193951ec7e937b1652c0bd3bb1bf073573df883d2c34f1ef451fd46b50"
            "3f00", 16),
        int("00c6858e06b70404e9cd9e3ecb662395b4429c648139053fb521f828af606b4d"
            "3dbaa14b5e77efe75928fe1dc127a2ffa8de3348b3c1856a429bf97e7e31c2e5"
            "bd66", 16),
        int("011839296a789a3bc0045c8a5fb42c7d1bd998f54449579b446817afbd17273e"
            "662c97ee72995ef42640c550b9013fad0761353c7086a272c24088be94769fd1"
            "6650", 16),
        oid="1.3.132.0.35", field_kind="solinas",
        voprf=("P521-SHA512", "sha512"),
    )


# ---------------------------------------------------------------------------
# SM2 — reference: sm2/src/lib.rs:60-78, sm2/src/arithmetic.rs
# ---------------------------------------------------------------------------

def _sm2() -> CurveSpec:
    p = 0xFFFFFFFEFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFF00000000FFFFFFFFFFFFFFFF
    n = 0xFFFFFFFEFFFFFFFFFFFFFFFFFFFFFFFF7203DF6B21C6052B53BBF40939D54123
    return _curve(
        "sm2", p, n, -3,
        0x28E9FA9E9D9F5E344D5A9E4BCF6509A7F39789F515AB8F92DDBCBD414D940E93,
        0x32C4AE2C1F1981195F9904466A39C9948FE30BBFF2660BE1715A4589334C74C7,
        0xBC3736A2F4F6779C59BDCEE36B692153D0A9877CC62A474002DF32E52139F0A0,
        oid="1.2.156.10197.1.301", field_kind="mont",
    )


# ---------------------------------------------------------------------------
# bign-curve256v1 — reference: bign256/src/lib.rs:61-88, arithmetic/field.rs:49
# ---------------------------------------------------------------------------

def _bign256() -> CurveSpec:
    # bign G = (0, y) — see bign256/src/arithmetic.rs:41-45 (gx is zero)
    p = (1 << 256) - 189
    n = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFD95C8ED60DFB4DFC7E5ABF99263D6607
    return _curve(
        "bign256", p, n,
        p - 3,
        0x77CE6C1515F3A8EDD2C13AABE4D8FBBE4CF55069978B9253B22E7D6BD69C03F1,
        0,
        0x6BF7FC3CFB16D69F5CE4C9A351D6835D78913966C408F6521E29CF1804516A93,
        oid="1.2.112.0.2.0.34.101.45.3.1", field_kind="solinas",
    )


# ---------------------------------------------------------------------------
# Brainpool P-256/384 r1+t1 — reference: bp256/bp384 crates
# ---------------------------------------------------------------------------

def _bp256r1() -> CurveSpec:
    p = 0xA9FB57DBA1EEA9BC3E660A909D838D726E3BF623D52620282013481D1F6E5377
    n = 0xA9FB57DBA1EEA9BC3E660A909D838D718C397AA3B561A6F7901E0E82974856A7
    return _curve(
        "bp256r1", p, n,
        0x7D5A0975FC2C3057EEF67530417AFFE7FB8055C126DC5C6CE94A4B44F330B5D9,
        0x26DC5C6CE94A4B44F330B5D9BBD77CBF958416295CF7E1CE6BCCDC18FF8C07B6,
        0x8BD2AEB9CB7E57CB2C4B482FFC81B7AFB9DE27E1E3BD23C23A4453BD9ACE3262,
        0x547EF835C3DAC4FD97F8461A14611DC9C27745132DED8E545C1D54C72F046997,
        oid="1.3.36.3.3.2.8.1.1.7", field_kind="mont",
    )


def _bp256t1() -> CurveSpec:
    p = 0xA9FB57DBA1EEA9BC3E660A909D838D726E3BF623D52620282013481D1F6E5377
    n = 0xA9FB57DBA1EEA9BC3E660A909D838D718C397AA3B561A6F7901E0E82974856A7
    return _curve(
        "bp256t1", p, n, -3,
        0x662C61C430D84EA4FE66A7733D0B76B7BF93EBC4AF2F49256AE58101FEE92B04,
        0xA3E8EB3CC1CFE7B7732213B23A656149AFA142C47AAFBC2B79A191562E1305F4,
        0x2D996C823439C56D7F7B22E14644417E69BCB6DE39D027001DABE8F35B25C9BE,
        oid="1.3.36.3.3.2.8.1.1.8", field_kind="mont",
    )


def _bp384r1() -> CurveSpec:
    p = int("8cb91e82a3386d280f5d6f7e50e641df152f7109ed5456b412b1da197fb71123"
            "acd3a729901d1a71874700133107ec53", 16)
    n = int("8cb91e82a3386d280f5d6f7e50e641df152f7109ed5456b31f166e6cac0425a7"
            "cf3ab6af6b7fc3103b883202e9046565", 16)
    return _curve(
        "bp384r1", p, n,
        int("7bc382c63d8c150c3c72080ace05afa0c2bea28e4fb22787139165efba91f90f"
            "8aa5814a503ad4eb04a8c7dd22ce2826", 16),
        int("04a8c7dd22ce28268b39b55416f0447c2fb77de107dcd2a62e880ea53eeb62d5"
            "7cb4390295dbc9943ab78696fa504c11", 16),
        int("1d1c64f068cf45ffa2a63a81b7c13f6b8847a3e77ef14fe3db7fcafe0cbd10e8"
            "e826e03436d646aaef87b2e247d4af1e", 16),
        int("8abe1d7520f9c2a45cb1eb8e95cfd55262b70b29feec5864e19c054ff9912928"
            "0e4646217791811142820341263c5315", 16),
        oid="1.3.36.3.3.2.8.1.1.11", field_kind="mont",
    )


def _bp384t1() -> CurveSpec:
    p = int("8cb91e82a3386d280f5d6f7e50e641df152f7109ed5456b412b1da197fb71123"
            "acd3a729901d1a71874700133107ec53", 16)
    n = int("8cb91e82a3386d280f5d6f7e50e641df152f7109ed5456b31f166e6cac0425a7"
            "cf3ab6af6b7fc3103b883202e9046565", 16)
    return _curve(
        "bp384t1", p, n, -3,
        int("7f519eada7bda81bd826dba647910f8c4b9346ed8ccdc64e4b1abd11756dce1d"
            "2074aa263b88805ced70355a33b471ee", 16),
        int("18de98b02db9a306f2afcd7235f72a819b80ab12ebd653172476fecd462aabff"
            "c4ff191b946a5f54d8d0aa2f418808cc", 16),
        int("25ab056962d30651a114afd2755ad336747f93475b7a1fca3b88f2b6a208ccfe"
            "469408584dc2b2912675bf5b9e582928", 16),
        oid="1.3.36.3.3.2.8.1.1.12", field_kind="mont",
    )


_REGISTRY = {
    "secp256k1": _secp256k1,
    "p192": _p192,
    "p224": _p224,
    "p256": _p256,
    "p384": _p384,
    "p521": _p521,
    "sm2": _sm2,
    "bign256": _bign256,
    "bp256r1": _bp256r1,
    "bp256t1": _bp256t1,
    "bp384r1": _bp384r1,
    "bp384t1": _bp384t1,
}
