"""MSM tests: single-device vs host oracle, multi-device sharded via the
8-virtual-device CPU mesh, batch normalization."""

import jax
import numpy as np
import pytest

from tpu_ecc.curves.specs import get_curve
from tpu_ecc.ops import fe as F
from tpu_ecc.ops import points as P
from tpu_ecc.parallel import collectives, msm as M
from tpu_ecc.utils import ec_host as H


def _host_msm(c, pts, ks):
    acc = None
    for p_, k in zip(pts, ks):
        acc = H.aff_add(c, acc, H.aff_mul(c, k, p_))
    return acc


def test_msm_single_device(rng):
    c = get_curve("secp256k1")
    G = H.aff_generator(c)
    pts = [H.aff_mul(c, rng.randrange(1, c.n), G) for _ in range(9)]
    ks = [rng.randrange(1, 1 << 16) for _ in range(9)]
    got = M.msm(c, pts, ks, terms=2, scalar_bits=16)
    assert got == _host_msm(c, pts, ks)


def test_msm_zero_and_identity(rng):
    c = get_curve("secp256k1")
    G = H.aff_generator(c)
    pts = [G, H.aff_mul(c, 7, G)]
    # k=0 terms and a total that cancels to the identity
    assert M.msm(c, pts, [0, 0], terms=2, scalar_bits=16) is None
    got = M.msm(c, [G, G], [5, c.n - 5], terms=2)
    assert got is None


def test_msm_pippenger(rng):
    """Bucketed Pippenger kernel vs oracle, incl. zero digits and the
    single-bucket-spans-all-lanes edge."""
    c = get_curve("secp256k1")
    G = H.aff_generator(c)
    base = [H.aff_mul(c, rng.randrange(1, c.n), G) for _ in range(8)]
    N = 128
    pts = [base[i % 8] for i in range(N)]
    ks = [rng.randrange(0, 1 << 16) for _ in range(N)]
    ks[3] = ks[5] = 0
    got = M.msm(c, pts, ks, method="pippenger", w=5, lanes=16, scalar_bits=16)
    assert got == _host_msm(c, pts, ks)
    ks2 = [7] * N   # every point in one bucket, runs crossing all lanes
    got = M.msm(c, pts, ks2, method="pippenger", w=5, lanes=16, scalar_bits=16)
    assert got == _host_msm(c, pts, ks2)


def test_msm_pippenger_signed(rng):
    """Signed-digit Pippenger (halved bucket space, PERF.md r3 lever) vs
    oracle: max digits (carry chains), zero scalars, the bits % w == 0
    carry-window case (w=8/16-bit scalars), and full-width scalars."""
    c = get_curve("secp256k1")
    G = H.aff_generator(c)
    base = [H.aff_mul(c, rng.randrange(1, c.n), G) for _ in range(8)]
    N = 256
    pts = [base[i % 8] for i in range(N)]
    ks = [rng.randrange(0, 1 << 16) for _ in range(N)]
    ks[0] = 0
    ks[1] = (1 << 16) - 1
    for w in (5, 8):
        got = M.msm(c, pts, ks, method="pippenger", w=w, lanes=16,
                    scalar_bits=16, signed=True)
        assert got == _host_msm(c, pts, ks), f"signed w={w}"
    ks2 = [rng.randrange(0, c.n) for _ in range(N)]
    got = M.msm(c, pts, ks2, method="pippenger", w=13, lanes=32, signed=True)
    assert got == _host_msm(c, pts, ks2), "signed full-width"


def test_msm_sharded_mesh(rng):
    """Points sharded over 8 virtual devices; replicated result == oracle —
    under BOTH collective implementations (all_gather+tree fold and the
    ppermute ring-reduce), which must agree with each other too."""
    c = get_curve("secp256k1")
    mesh = collectives.make_mesh(8, "dp")
    G = H.aff_generator(c)
    N = 2 * 128 * 8
    base = [H.aff_mul(c, rng.randrange(1, c.n), G) for _ in range(8)]
    pts = [base[i % 8] for i in range(N)]
    ks = [rng.randrange(0, 1 << 16) for _ in range(N)]
    want = _host_msm(c, pts, ks)
    for rm in ("gather", "ring"):
        got = M.msm(c, pts, ks, mesh=mesh, axis="dp", terms=2,
                    scalar_bits=16, reduce_method=rm)
        assert got == want, f"reduce_method={rm}"


def test_msm_sharded_hierarchical_2axis(rng):
    """Hierarchical DCN x ICI reduction (SURVEY §2.8): points sharded over a
    2x4 (dcn, ici) mesh; partials fold on the ici axis first, then one point
    per slice crosses dcn. Replicated result == oracle, both methods."""
    c = get_curve("secp256k1")
    mesh = collectives.make_mesh(shape=(2, 4), axes=("dcn", "ici"))
    G = H.aff_generator(c)
    N = 2 * 128 * 8
    base = [H.aff_mul(c, rng.randrange(1, c.n), G) for _ in range(8)]
    pts = [base[i % 8] for i in range(N)]
    ks = [rng.randrange(0, 1 << 16) for _ in range(N)]
    got = M.msm(c, pts, ks, mesh=mesh, axis=("dcn", "ici"), terms=2,
                scalar_bits=16)   # auto -> ring on both short axes
    assert got == _host_msm(c, pts, ks)
    got = M.msm(c, pts, ks, mesh=mesh, axis=("dcn", "ici"),
                method="pippenger", w=8, lanes=32, scalar_bits=16,
                reduce_method="gather")
    assert got == _host_msm(c, pts, ks)


def test_msm_sharded_pippenger_fullwidth(rng):
    """Full-width 256-bit signed Pippenger through the SHARDED program
    (VERDICT r4 item 5): the multi-device composition of sort/segscan/
    carry-stitch at 21 windows is exactly where a sharding bug would hide —
    previously only 16-bit scalars ever ran sharded. Both collective
    implementations, vs the host oracle."""
    c = get_curve("secp256k1")
    mesh = collectives.make_mesh(8, "dp")
    G = H.aff_generator(c)
    N = 32 * 8
    base = [H.aff_mul(c, rng.randrange(1, c.n), G) for _ in range(8)]
    pts = [base[i % 8] for i in range(N)]
    ks = [rng.randrange(0, c.n) for _ in range(N)]
    ks[0] = 0
    ks[1] = c.n - 1
    want = _host_msm(c, pts, ks)
    for rm in ("gather", "ring"):
        got = M.msm(c, pts, ks, mesh=mesh, axis="dp", method="pippenger",
                    w=13, lanes=8, signed=True, reduce_method=rm)
        assert got == want, f"reduce_method={rm}"


@pytest.mark.slow
def test_msm_sharded_pippenger(rng):
    """The production large-N path: per-device Pippenger partials + mesh fold
    (same program the driver dryrun compiles)."""
    c = get_curve("secp256k1")
    mesh = collectives.make_mesh(8, "dp")
    G = H.aff_generator(c)
    N = 2 * 128 * 8
    base = [H.aff_mul(c, rng.randrange(1, c.n), G) for _ in range(8)]
    pts = [base[i % 8] for i in range(N)]
    ks = [rng.randrange(0, 1 << 16) for _ in range(N)]
    got = M.msm(c, pts, ks, mesh=mesh, axis="dp", method="pippenger",
                w=8, lanes=32, scalar_bits=16)
    assert got == _host_msm(c, pts, ks)


def test_tree_reduce_and_batch_normalize(rng):
    c = get_curve("secp256k1")
    G = H.aff_generator(c)
    ks = [rng.randrange(1, c.n) for _ in range(8)]
    pts = [H.aff_mul(c, k, G) for k in ks]
    pp = P.from_affine_ints(c, [p_[0] for p_ in pts], [p_[1] for p_ in pts])

    red = jax.jit(lambda q: P.point_limbs(M.tree_reduce_points(P.steady(q))))(pp)
    x, y, inf = jax.jit(P.to_affine)(P.point_from_limbs(c, red))
    want = _host_msm(c, pts, [1] * 8)
    assert not bool(np.asarray(inf))
    assert (F.fe_to_ints(x)[0], F.fe_to_ints(y)[0]) == want

    # batch_normalize matches to_affine, including an identity lane
    idp = P.pselect(np.array([False] * 7 + [True]), P.identity(c, (8,)), pp)
    bx, by, binf = jax.jit(P.batch_normalize)(idp)
    assert list(np.asarray(binf)) == [False] * 7 + [True]
    assert F.fe_to_ints(bx)[:7] == [p_[0] for p_ in pts[:7]]
    assert F.fe_to_ints(by)[:7] == [p_[1] for p_ in pts[:7]]
