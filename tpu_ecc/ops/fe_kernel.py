"""Mosaic-native field arithmetic for Pallas kernel bodies: KFE.

The graph-level engine (fe.py) stores a field-element batch as one
uint32[n_limbs, *batch] array and leans on XLA's scatter/pad fusion. Mosaic
(the Pallas TPU compiler) punishes that layout: any op that restructures the
limb (sublane) axis — concat, pad, scatter — forces relayouts, and round 1's
kernel ran ~60x slower than XLA because every convolution step concatenated
(PERF.md round-1 "Pallas kernel status").

KFE is the kernel-native representation: a field-element *block* is a Python
list of per-limb tiles, each an independent [S, 128] (sublane x lane) array
over batch lanes. Every arithmetic step is then a full-tile VPU op on one
limb; the limb axis lives entirely in Python (unrolled SSA values), so Mosaic
never sees a sublane-axis reshape. The schoolbook convolution becomes n^2
explicit multiply-adds into 2n-1 accumulator locals; carry chains unroll.

Same math as fe.py: 13/12-bit limbs with the static trace-time bound/vmax
ledger deciding where carries are emitted (the bound constants and
`_sub_bias` are shared with fe.py so the two engines cannot drift apart).
Both backends are supported: solinas (fold-constant reduction — secp256k1,
P-521, P-192, bign256) and Montgomery CIOS (headroom-limb word-by-word
reduction, cf. fe._mont_reduce — P-224/256/384, SM2, brainpool), each as
explicit per-limb locals with unrolled carry chains.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils.bigint import int_to_limbs
from .fe import FieldSpec, U32, _sub_bias


class KFE:
    """Kernel field element: list of per-limb tiles + static bounds."""

    __slots__ = ("limbs", "spec", "bound", "vmax")

    def __init__(self, limbs, spec: FieldSpec, bound: int, vmax: int):
        self.limbs = list(limbs)
        self.spec = spec
        self.bound = bound
        self.vmax = vmax

    def __add__(self, other):
        return kadd(self, other)

    def __sub__(self, other):
        return ksub(self, other)

    def __mul__(self, other):
        if isinstance(other, KFE):
            return kmul(self, other)
        return kmul_small(self, int(other))

    __rmul__ = __mul__

    def __neg__(self):
        return kneg(self)

    def square(self):
        return ksquare(self)


def kfe_zeros(spec: FieldSpec, shape) -> KFE:
    z = jnp.zeros(shape, U32)
    return KFE([z] * spec.n_limbs, spec, 0, 0)


def kfe_from_rows(spec: FieldSpec, rows, bound=None, vmax=None) -> KFE:
    """Wrap per-limb tiles known to be carried steady-state."""
    return KFE(rows, spec, bound if bound is not None else spec.mask,
               vmax if vmax is not None else spec.carried_vmax)


def _carry_unrolled(cols, b: int, mask: int):
    """Sequential carry chain, unrolled over the limb list. Returns
    (normalized cols, carry-out tile or None)."""
    bs, ms = np.uint32(b), np.uint32(mask)
    out, c = [], None
    for col in cols:
        t = col if c is None else col + c
        out.append(t & ms)
        c = t >> bs
    return out, c


def _solinas_reduce_k(spec: FieldSpec, cols: list, bound: int, vmax: int) -> KFE:
    """List-form port of fe._solinas_reduce: identical static control flow
    (same bound ledger, same carry/fold rounds), list ops instead of array
    slicing so Mosaic sees only full-tile adds/mults."""
    b, n, mask = spec.limb_bits, spec.n_limbs, spec.mask
    f_val, fold1 = spec.fold1_val, spec.fold1
    W = spec.W
    fold_bound = mask + len(fold1) * mask * max(fold1)
    assert fold_bound < (1 << 31)
    zero = jnp.zeros_like(cols[0])

    def _fold(lo, hi):
        lo = list(lo)
        for k, f in enumerate(fold1):
            if f == 0:
                continue
            for j, h in enumerate(hi):
                idx = k + j
                while len(lo) <= idx:
                    lo.append(zero)
                lo[idx] = lo[idx] + h * np.uint32(f)
        return lo

    def _fit(cols, bound, vmax):
        m0 = len(cols)
        vmax = min(vmax, sum(bound << (b * j) for j in range(m0)))
        m = max(n, -(-max(vmax.bit_length(), 1) // b))
        cols = cols[:m] + [zero] * (m - len(cols))
        return cols, vmax

    rounds = 0
    cols, vmax = _fit(list(cols), bound, vmax)
    while vmax >= (W << 17):
        rounds += 1
        assert rounds < 6, "solinas reduction failed to converge (bug)"
        cols, _ = _carry_unrolled(cols, b, mask)        # carry-out provably 0
        cols = _fold(cols[:n], cols[n:])
        vmax = (W - 1) + f_val * (vmax >> (b * n))
        bound = fold_bound
        cols, vmax = _fit(cols, bound, vmax)

    m = len(cols)
    cols, _ = _carry_unrolled(cols, b, mask)            # carry-out provably 0
    if m > n:
        assert (m - n - 1) + (len(fold1) - 1) < n
        cols = _fold(cols[:n], cols[n:])[:n]
        vmax = (W - 1) + f_val * (vmax >> (b * n))
        assert vmax < 2 * W
        cols, c = _carry_unrolled(cols, b, mask)
        excess_bits = f_val.bit_length() + 17
        L = min(n, -(-excess_bits // b) + 2)
        assert len(fold1) <= L
        head = list(cols[:L])
        for k, f in enumerate(fold1):
            if f:
                head[k] = head[k] + c * np.uint32(f)
        head, _ = _carry_unrolled(head, b, mask)
        cols = head + cols[L:]
    return KFE(cols, spec, mask, min(vmax, W - 1))


def _mont_reduce_k(spec: FieldSpec, cols: list, in_vmax: int) -> KFE:
    """List-form port of fe._mont_reduce (word-by-word Montgomery CIOS):
    2n explicit column locals, the m*p accumulation as per-limb multiply-adds
    (zero p-limbs skipped), carry chain unrolled — no sublane restructuring
    for Mosaic to relayout."""
    b, n, mask, n0 = spec.limb_bits, spec.n_limbs, spec.mask, spec.n0
    cols = list(cols)
    zero = jnp.zeros_like(cols[0])
    while len(cols) < 2 * n:
        cols.append(zero)
    bs, ms, n0s = np.uint32(b), np.uint32(mask), np.uint32(n0)
    for i in range(n):
        m = (cols[i] * n0s) & ms
        for j, pj in enumerate(spec.p_limbs):
            if pj:
                cols[i + j] = cols[i + j] + m * np.uint32(pj)
        cols[i + 1] = cols[i + 1] + (cols[i] >> bs)
    out_vmax = in_vmax // spec.W + spec.p + 1
    assert out_vmax < spec.W
    rows, _ = _carry_unrolled(cols[n:2 * n], b, mask)  # carry-out provably 0
    return KFE(rows, spec, mask, out_vmax)


def kcarry(x: KFE) -> KFE:
    s = x.spec
    if x.bound <= s.mask:
        return x
    if s.kind == "mont":
        assert x.vmax < s.W, (
            f"{s.name}: value bound 2^{x.vmax.bit_length()} overflows"
            " representation; insert an explicit reduction")
        assert x.bound + (x.bound >> s.limb_bits) + 2 < (1 << 32)
        rows, _ = _carry_unrolled(x.limbs, s.limb_bits, s.mask)
        return KFE(rows, s, s.mask, x.vmax)
    assert x.vmax < s.carry_in_vmax, f"{s.name}: carry entry vmax too large"
    return _solinas_reduce_k(s, x.limbs, x.bound, x.vmax)


def _cond_sub_k(spec: FieldSpec, cols: list, m_limbs):
    """Constant-time conditional subtract (list-form fe._cond_sub): the
    borrow chain unrolled over the limb list."""
    b, mask = spec.limb_bits, spec.mask
    bs, ms, one = np.uint32(b), np.uint32(mask), np.uint32(1)
    borrow = jnp.zeros_like(cols[0])
    sub = []
    for r, ml in zip(cols, m_limbs):
        t = r + np.uint32((1 << b) - ml) - borrow
        sub.append(t & ms)
        borrow = one - (t >> bs)
    ge = borrow == 0              # no final borrow -> cols >= m
    return [jnp.where(ge, sv, cv) for sv, cv in zip(sub, cols)], ge


def kreduce(x: KFE, mult: int = 1) -> KFE:
    """Constant-time reduce below mult*p (list-form fe.freduce): identical
    static schedule of conditional subtractions of p << i."""
    s = x.spec
    x = kcarry(x)
    cols = list(x.limbs)
    vmax = min(x.vmax, s.W - 1)
    lo = mult.bit_length() - 1
    assert mult == 1 << lo
    i = max(lo, (vmax // s.p).bit_length() - 1)
    while vmax >= mult * s.p and i >= lo:
        m = s.p << i
        if m < s.W:
            cols, _ = _cond_sub_k(s, cols,
                                  int_to_limbs(m, s.n_limbs, s.limb_bits))
            vmax = max(m - 1, vmax - m)
        i -= 1
    assert vmax < mult * s.p
    return KFE(cols, s, s.mask, vmax)


def ksteady(x: KFE) -> KFE:
    s = x.spec
    if s.kind == "mont":
        x = kreduce(x, 4)         # cf. points.steady's freduce(v, 4)
        return KFE(x.limbs, s, s.mask, s.carried_vmax)
    x = kcarry(x)
    assert x.vmax <= s.carried_vmax, f"{s.name}: not steady"
    return KFE(x.limbs, s, s.mask, s.carried_vmax)


def kadd(x: KFE, y: KFE) -> KFE:
    s = x.spec
    assert y.spec is s
    if x.bound + y.bound >= (1 << 32):
        x, y = kcarry(x), kcarry(y)
    return KFE([a + b for a, b in zip(x.limbs, y.limbs)], s,
               x.bound + y.bound, x.vmax + y.vmax)


def ksub(x: KFE, y: KFE) -> KFE:
    s = x.spec
    assert y.spec is s
    if y.bound > s.mask:
        y = kcarry(y)
    K, K_val, K_max = _sub_bias(s, y.bound, y.vmax.bit_length())
    if x.bound + K_max >= (1 << 32):
        x = kcarry(x)
    out = [a + np.uint32(k) - b for a, k, b in zip(x.limbs, K, y.limbs)]
    bound = x.bound + K_max
    assert bound < (1 << 32)
    return KFE(out, s, bound, x.vmax + K_val)


def kneg(y: KFE) -> KFE:
    s = y.spec
    if y.bound > s.mask:
        y = kcarry(y)
    K, K_val, K_max = _sub_bias(s, y.bound, y.vmax.bit_length())
    return KFE([np.uint32(k) - b for k, b in zip(K, y.limbs)], s, K_max, K_val)


def kmul_small(x: KFE, k: int) -> KFE:
    if k == 0:
        return KFE([jnp.zeros_like(x.limbs[0])] * x.spec.n_limbs, x.spec, 0, 0)
    if k == 1:
        return x
    if x.bound * k >= (1 << 32):
        x = kcarry(x)
    assert x.bound * k < (1 << 32)
    return KFE([a * np.uint32(k) for a in x.limbs], x.spec,
               x.bound * k, x.vmax * k)


def _conv_k(xl: list, yl: list) -> list:
    """Schoolbook convolution into 2n-1 explicit accumulator locals — the
    scatter/concat-free heart of the kernel engine."""
    n, m = len(xl), len(yl)
    acc = [None] * (n + m - 1)
    for i in range(n):
        for j in range(m):
            p = xl[i] * yl[j]
            k = i + j
            acc[k] = p if acc[k] is None else acc[k] + p
    return acc


def kmul(x: KFE, y: KFE) -> KFE:
    s = x.spec
    assert y.spec is s
    if x.bound > s.mul_in_bound:
        x = kcarry(x)
    if y.bound > s.mul_in_bound:
        y = kcarry(y)
    cols = _conv_k(x.limbs, y.limbs)
    col_bound = s.n_limbs * x.bound * y.bound
    if s.kind == "mont":
        assert (col_bound + s.n_limbs * (1 << (2 * s.limb_bits))
                + (1 << 21) < (1 << 32))
        return _mont_reduce_k(s, cols, x.vmax * y.vmax)
    assert col_bound < (1 << 32)
    return _solinas_reduce_k(s, cols, col_bound, x.vmax * y.vmax)


def ksquare(x: KFE) -> KFE:
    s = x.spec
    if not s.sq_symmetric:
        return kmul(x, x)
    if x.bound > s.sq_in_bound:
        x = kcarry(x)
    n = len(x.limbs)
    acc = [None] * (2 * n - 1)

    def put(k, v):
        acc[k] = v if acc[k] is None else acc[k] + v

    for i in range(n):
        put(2 * i, x.limbs[i] * x.limbs[i])
        d = x.limbs[i] + x.limbs[i]
        for j in range(i + 1, n):
            put(i + j, d * x.limbs[j])
    col_bound = 2 * s.n_limbs * x.bound * x.bound
    if s.kind == "mont":
        assert (col_bound + s.n_limbs * (1 << (2 * s.limb_bits))
                + (1 << 21) < (1 << 32))
        return _mont_reduce_k(s, acc, x.vmax * x.vmax)
    assert col_bound < (1 << 32)
    return _solinas_reduce_k(s, acc, col_bound, x.vmax * x.vmax)


def kfe_const(spec: FieldSpec, value: int, shape) -> KFE:
    v = spec.encode_int(value)
    rows = [jnp.full(shape, np.uint32(l), U32)
            for l in int_to_limbs(v, spec.n_limbs, spec.limb_bits)]
    return KFE(rows, spec, spec.mask, max(v, 1))
