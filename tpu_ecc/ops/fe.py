"""Batched prime-field arithmetic in 13/12-bit limbs over uint32 TPU lanes.

Design (see DESIGN.md):

- A batch of field elements is `uint32[n_limbs, *batch]` (limb-major; batch on lanes).
- Limbs are ~13 bits so products of limbs (< 2^26) and whole schoolbook-convolution
  columns (< n * 2^26) fit plain uint32 VPU ops: no widening multiply, no carries
  inside the convolution. This is the reference's lazy-limb idea
  (k256/src/arithmetic/field/field_10x26.rs) re-derived for 32-bit lanes.
- `FE` carries *static trace-time* bounds: `bound` (max any limb) and `vmax` (max
  integer value). They are plain Python ints updated as ops trace; carry passes are
  auto-inserted exactly where a bound would overflow, and impossible states raise at
  trace time. This is the TPU equivalent of the reference's magnitude system +
  debug sanitizer (k256/src/arithmetic/field/field_impl.rs) at zero runtime cost.
- Two reduction backends, selected per spec:
    * 'solinas'  p = 2^t - c with small fold constant (secp256k1, bign256, P-521,
      P-192): canonical-domain values, reduce by folding high limbs with
      `2^(b*n) mod p` (cf. field_10x26.rs:352-661 interleaved reduction).
    * 'mont'     generic word-by-word Montgomery, radix 2^13 (or 2^12 for wide
      fields), one extra headroom limb so R >= 2^13 * p and outputs stay < ~1.1p
      (cf. the fiat-crypto crates, e.g. p384/src/arithmetic/field/p384_64.rs).
- Montgomery-domain conversion happens host-side in Python ints (encode_int /
  decode_int); device kernels never convert domains.
- Sequential carry/borrow chains are `lax.scan`s over the limb axis; convolutions
  are O(n) slice-accumulates — jaxprs stay small so whole protocols jit quickly.

Constant-time: everything is straight-line masked arithmetic over the whole batch;
no secret can influence control flow or memory layout by construction.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.bigint import int_to_limbs, limbs_to_int

U32 = jnp.uint32
_MAX32 = (1 << 32) - 1


def _inv_mod(a: int, m: int) -> int:
    return pow(a, -1, m)


@dataclasses.dataclass(frozen=True, eq=False)  # eq=False: identity hash, jit-static
class FieldSpec:
    """All static data for one prime field. Built via make_field_spec()."""

    name: str
    p: int
    kind: str                 # 'solinas' | 'mont'
    limb_bits: int
    n_limbs: int
    # derived
    bits: int = 0
    mask: int = 0
    mul_in_bound: int = 0     # max limb bound admissible as multiply input
    sq_in_bound: int = 0      # max limb bound admissible as (symmetric) square input
    sq_symmetric: bool = False
    carry_in_vmax: int = 0    # max vmax admissible at carry() entry
    carried_vmax: int = 0     # steady-state vmax for carried values (loop invariant)
    # solinas
    fold1: tuple = ()         # limbs of 2^(b*n) mod p (the fold constant)
    fold1_val: int = 0
    # montgomery
    r: int = 1                # R (1 for solinas)
    r2: int = 0               # R^2 mod p
    n0: int = 0               # -p^-1 mod 2^b
    p_limbs: tuple = ()

    def __hash__(self):
        return id(self)

    def __repr__(self):
        return f"FieldSpec({self.name}, {self.kind}, {self.n_limbs}x{self.limb_bits})"

    @property
    def W(self) -> int:
        """Representation modulus 2^(b*n)."""
        return 1 << (self.limb_bits * self.n_limbs)

    # ---- host-side domain codecs ----
    def encode_int(self, x: int) -> int:
        """Math value -> internal-domain value (Montgomery form for 'mont')."""
        x %= self.p
        return (x * self.r) % self.p if self.kind == "mont" else x

    def decode_int(self, x: int) -> int:
        x %= self.p
        return (x * _inv_mod(self.r, self.p)) % self.p if self.kind == "mont" else x


def make_field_spec(name: str, p: int, kind: Optional[str] = None) -> FieldSpec:
    bits = p.bit_length()
    c = (1 << bits) - p
    if kind is None:
        kind = "solinas" if c.bit_length() <= 40 else "mont"

    if kind == "solinas":
        b = 13
        n = -(-bits // b)                       # weak form: values < 2^(b*n)
        fold1_val = (1 << (b * n)) % p
        nf = -(-fold1_val.bit_length() // b)
        fold1 = int_to_limbs(fold1_val, nf, b)
        if max(fold1) > (1 << b):
            raise ValueError(f"{name}: fold digits too large for solinas backend")
        mask = (1 << b) - 1
        mul_in = int((_MAX32 / n) ** 0.5)
        sq_in = int((_MAX32 / (2 * n)) ** 0.5)
        sq_symmetric = sq_in >= mask + 8
        if not sq_symmetric:
            sq_in = mul_in
        if mul_in < mask + 8:
            raise ValueError(f"{name}: solinas limb plan infeasible (n={n})")
        W = 1 << (b * n)
        return FieldSpec(
            name=name, p=p, kind=kind, limb_bits=b, n_limbs=n, bits=bits, mask=mask,
            mul_in_bound=mul_in, sq_in_bound=sq_in, sq_symmetric=sq_symmetric,
            carry_in_vmax=W << 17, carried_vmax=W - 1,
            fold1=fold1, fold1_val=fold1_val,
            p_limbs=int_to_limbs(p, n, b),
        )

    # --- montgomery ---
    b = 13 if (-(-bits // 13) + 1) <= 31 else 12
    n = -(-bits // b) + 1                       # headroom limb: R >= 2^b * p
    mask = (1 << b) - 1
    R = 1 << (b * n)
    assert R >= (1 << b) * p
    # overflow budget: n*B^2 (conv) + n*2^2b (m*p additions) + carries < 2^32
    slack = _MAX32 - n * (1 << (2 * b)) - (1 << 21)
    mul_in = int((slack / n) ** 0.5)
    sq_in = int((slack / (2 * n)) ** 0.5)
    sq_symmetric = sq_in >= mask + 8
    if not sq_symmetric:
        sq_in = mul_in
    if mul_in < mask + 8:
        raise ValueError(f"{name}: mont limb plan infeasible (n={n}, b={b})")
    return FieldSpec(
        name=name, p=p, kind=kind, limb_bits=b, n_limbs=n, bits=bits, mask=mask,
        mul_in_bound=mul_in, sq_in_bound=sq_in, sq_symmetric=sq_symmetric,
        carry_in_vmax=R, carried_vmax=4 * p,
        r=R % p, r2=(R * R) % p, n0=(-_inv_mod(p, 1 << b)) % (1 << b),
        p_limbs=int_to_limbs(p, n, b),
    )


# ---------------------------------------------------------------------------
# FE: a batch of field elements with static bounds
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class FE:
    limbs: jax.Array          # uint32[n_limbs, *batch]
    spec: FieldSpec           # static
    bound: int                # static: max possible limb value
    vmax: int                 # static: max possible integer value

    def tree_flatten(self):
        return (self.limbs,), (self.spec, self.bound, self.vmax)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    # -- operators make RCB formula code read like the paper --
    def __add__(self, other):
        return fadd(self, other)

    def __sub__(self, other):
        return fsub(self, other)

    def __mul__(self, other):
        if isinstance(other, FE):
            return fmul(self, other)
        return fmul_small(self, int(other))

    __rmul__ = __mul__

    def __neg__(self):
        return fneg(self)

    def square(self):
        return fsquare(self)

    def carry(self):
        return fcarry(self)

    def invert(self):
        return finv(self)

    @property
    def batch_shape(self):
        return self.limbs.shape[1:]


PALLAS_MODE = False
"""Inside Pallas kernel bodies: unroll scans and inline limb constants as
scalar literals (Mosaic kernels cannot capture array constants)."""


def _const_arr(limbs, ndim: int):
    if PALLAS_MODE:
        shape = (1,) + (1,) * (ndim - 1)
        cols = [jnp.full(shape, np.uint32(v), U32) for v in limbs]
        return jnp.concatenate(cols, axis=0)
    arr = np.array(limbs, np.uint32).reshape((len(limbs),) + (1,) * (ndim - 1))
    return jnp.asarray(arr)


def fe_zeros(spec: FieldSpec, batch_shape=()) -> FE:
    return FE(jnp.zeros((spec.n_limbs, *batch_shape), U32), spec, 0, 0)


def fe_from_int(spec: FieldSpec, value: int, batch_shape=()) -> FE:
    """Constant element (host int, math domain) broadcast over a batch."""
    v = spec.encode_int(value)
    arr = np.array(int_to_limbs(v, spec.n_limbs, spec.limb_bits), np.uint32)
    arr = arr.reshape((spec.n_limbs,) + (1,) * len(batch_shape))
    limbs = jnp.broadcast_to(jnp.asarray(arr), (spec.n_limbs, *batch_shape))
    return FE(limbs, spec, spec.mask, max(v, 1))


def fe_from_ints(spec: FieldSpec, values, batch_shape=None) -> FE:
    """Host batch of math-domain ints -> device FE (canonical, carried)."""
    from ..utils.bigint import ints_to_limbs_np

    vs = [spec.encode_int(v) for v in values]
    arr = ints_to_limbs_np(vs, spec.n_limbs, spec.limb_bits)
    if batch_shape is not None:
        arr = arr.reshape((spec.n_limbs, *batch_shape))
    return FE(jnp.asarray(arr), spec, spec.mask, spec.p - 1 if vs else 0)


def fe_to_ints(x: FE) -> list[int]:
    """Device FE -> host list of canonical math-domain ints."""
    if not (x.bound <= x.spec.mask and x.vmax < x.spec.p):
        x = fcanonical(x)
    arr = np.asarray(jax.device_get(x.limbs))
    flat = arr.reshape(x.spec.n_limbs, -1)
    return [
        x.spec.decode_int(limbs_to_int(flat[:, k], x.spec.limb_bits))
        for k in range(flat.shape[1])
    ]


def fe_steady(spec: FieldSpec, limbs: jax.Array) -> FE:
    """Wrap raw limbs known to be carried steady-state (for loop-carried state)."""
    return FE(limbs, spec, spec.mask, spec.carried_vmax)


# ---------------------------------------------------------------------------
# carry passes and reduction (array-level; scans keep jaxprs small)
# ---------------------------------------------------------------------------


def _slice_add(arr: jax.Array, start: int, upd: jax.Array) -> jax.Array:
    """arr with arr[start:start+len(upd)] += upd.

    XLA path: zero-pad the update to arr's limb extent and add — a pure
    elementwise pattern that both fuses fully and compiles ~1.6x faster than
    the scatter-add (`.at[].add`) formulation it replaced (XLA:CPU expands
    every scatter through ScatterExpander; measured on the sharded-MSM
    program: 346s -> 212s). Pallas path: slices + concat (Mosaic kernels
    cannot capture the scatter's index constants)."""
    m = upd.shape[0]
    n = arr.shape[0]
    if start == 0 and m == n:
        return arr + upd
    if not PALLAS_MODE:
        pads = [(start, n - start - m)] + [(0, 0)] * (arr.ndim - 1)
        return arr + jnp.pad(upd, pads)
    parts = []
    if start:
        parts.append(arr[:start])
    parts.append(arr[start:start + m] + upd)
    if start + m < arr.shape[0]:
        parts.append(arr[start + m:])
    return jnp.concatenate(parts, axis=0)


UNROLL_SCANS = False
"""When True, carry/borrow chains unroll instead of using lax.scan — required
inside Pallas kernel bodies (Mosaic has no scan) and cheap there since the
kernel graph is per-block. Also worth enabling (via `unrolled()`) for small
non-loop device programs like the GLV decomposition, where a lax.scan's
per-iteration overhead (~tens of us of unfused while-loop stepping) dwarfs
the work and XLA fuses the unrolled chain into a few kernels."""

import contextlib as _contextlib


@_contextlib.contextmanager
def unrolled():
    """Trace-time switch: carry/borrow chains unroll inside this context."""
    global UNROLL_SCANS
    old = UNROLL_SCANS
    UNROLL_SCANS = True
    try:
        yield
    finally:
        UNROLL_SCANS = old


def _carry_scan(cols: jax.Array, bound: int, b: int, mask: int):
    """Sequential carry chain over the limb axis via lax.scan.

    Returns (cols <= mask, carry_out[*batch]). The carry-out is mathematically
    zero whenever the value fits the limb count; callers drop it in that
    (statically asserted) case.
    """
    assert bound + (bound >> b) + 2 < (1 << 32), "carry pass would overflow uint32"
    bs, ms = np.uint32(b), np.uint32(mask)

    if UNROLL_SCANS or PALLAS_MODE:
        outs = []
        c = None
        for j in range(cols.shape[0]):
            t = cols[j] if c is None else cols[j] + c
            outs.append(t & ms)
            c = t >> bs
        return jnp.stack(outs, axis=0), c

    def step(c, x):
        t = x + c
        return t >> bs, t & ms

    c, out = jax.lax.scan(step, jnp.zeros_like(cols[0]), cols)
    return out, c


def _grow(cols: jax.Array, m: int) -> jax.Array:
    if cols.shape[0] >= m:
        return cols
    pad = jnp.zeros((m - cols.shape[0],) + cols.shape[1:], U32)
    return jnp.concatenate([cols, pad], axis=0)


def _fold_arr(lo: jax.Array, hi: jax.Array, fold1) -> jax.Array:
    """lo[k:k+len(hi)] += hi * fold1[k] for each fold digit (value-preserving
    mod p since fold1 represents 2^(b*n))."""
    h = hi.shape[0]
    for k, f in enumerate(fold1):
        if f == 0:
            continue
        lo = _grow(lo, k + h)
        lo = _slice_add(lo, k, hi * np.uint32(f))
    return lo


def _solinas_reduce(spec: FieldSpec, cols: jax.Array, bound: int, vmax: int) -> FE:
    """Reduce an m-limb bounded value to n carried limbs, value < 2^(b*n).

    Static Python bound arithmetic decides how many carry+fold rounds to emit;
    convergence is proven at trace time. Plays the role of the interleaved
    reduction in k256 field_10x26.rs:352-661, restructured as whole-batch passes.
    """
    b, n, mask = spec.limb_bits, spec.n_limbs, spec.mask
    f_val, fold1 = spec.fold1_val, spec.fold1
    W = spec.W
    fold_bound = mask + len(fold1) * mask * max(fold1)
    assert fold_bound < (1 << 31)

    def _fit(cols, bound, vmax):
        """Tighten vmax to the limbs' reach; trim provably-zero high limbs; pad."""
        m0 = cols.shape[0]
        vmax = min(vmax, sum(bound << (b * j) for j in range(m0)))
        m = max(n, -(-max(vmax.bit_length(), 1) // b))
        if m0 > m:
            cols = cols[:m]  # cols[j] <= vmax / 2^(b*j) < 1 for j >= m
        else:
            cols = _grow(cols, m)
        return cols, vmax

    # generic contraction rounds: carry-normalize, then fold limbs >= n
    rounds = 0
    cols, vmax = _fit(cols, bound, vmax)
    while vmax >= (W << 17):
        rounds += 1
        assert rounds < 6, "solinas reduction failed to converge (bug)"
        cols, _ = _carry_scan(cols, bound, b, mask)     # carry-out provably 0
        cols = _fold_arr(cols[:n], cols[n:], fold1)
        vmax = (W - 1) + f_val * (vmax >> (b * n))
        bound = fold_bound
        cols, vmax = _fit(cols, bound, vmax)

    # final phase: vmax < W << 17
    m = cols.shape[0]
    cols, _ = _carry_scan(cols, bound, b, mask)         # carry-out provably 0
    if m > n:
        assert (m - n - 1) + (len(fold1) - 1) < n       # fold tail stays inside n
        cols = _fold_arr(cols[:n], cols[n:], fold1)[:n]
        vmax = (W - 1) + f_val * (vmax >> (b * n))
        assert vmax < 2 * W
        cols, c = _carry_scan(cols, fold_bound, b, mask)
        # fold the 0/1 carry-out and absorb with a bounded mini-pass: when c=1
        # the remaining value is < f_val << 17, so limbs above that range are
        # zero and the pass cannot ripple past them (carry-out provably 0).
        excess_bits = f_val.bit_length() + 17
        L = min(n, -(-excess_bits // b) + 2)
        assert len(fold1) <= L
        fold_c = _const_arr(fold1, cols.ndim) * c
        head = _slice_add(cols[:L], 0, fold_c * jnp.ones((len(fold1),) + (1,) * (cols.ndim - 1), U32))
        head, _ = _carry_scan(head, mask + max(fold1), b, mask)
        cols = jnp.concatenate([head, cols[L:]], axis=0)
    return FE(cols, spec, mask, min(vmax, W - 1))


def fcarry(x: FE) -> FE:
    """Carry-normalize: limbs -> <= mask; value preserved (solinas also folds)."""
    s = x.spec
    if x.bound <= s.mask:
        return x
    if s.kind == "mont":
        assert x.vmax < s.W, (
            f"{s.name}: value bound 2^{x.vmax.bit_length()} overflows representation;"
            " insert an explicit reduction"
        )
        cols, _ = _carry_scan(x.limbs, x.bound, s.limb_bits, s.mask)
        return FE(cols, s, s.mask, x.vmax)
    assert x.vmax < s.carry_in_vmax, f"{s.name}: carry entry vmax too large"
    return _solinas_reduce(s, x.limbs, x.bound, x.vmax)


# ---------------------------------------------------------------------------
# add / sub / neg / small-mul
# ---------------------------------------------------------------------------

def fadd(x: FE, y: FE) -> FE:
    s = x.spec
    assert y.spec is s
    if x.bound + y.bound >= (1 << 32):
        x, y = fcarry(x), fcarry(y)
    return FE(x.limbs + y.limbs, s, x.bound + y.bound, x.vmax + y.vmax)


@functools.lru_cache(maxsize=None)
def _sub_bias(spec: FieldSpec, y_bound: int, y_vmax_bits: int):
    """Limbs of c*p with per-limb values >= any possible limb of y.

    K[j] = need[j] + digit_j(c*p - N) where N = sum need[j] 2^(b j); c minimal.
    Guarantees x + K - y never underflows limbwise. Returns (limbs, value, max).
    """
    b, n, p = spec.limb_bits, spec.n_limbs, spec.p
    y_vmax = (1 << y_vmax_bits) - 1
    need = [min(y_bound, y_vmax >> (b * j)) for j in range(n)]
    N = sum(nd << (b * j) for j, nd in enumerate(need))
    c = max(1, -(-N // p))
    while (c * p - N) >> (b * n):
        c += 1  # keep the excess-digit decomposition inside n limbs
    D = c * p - N
    dd = int_to_limbs(D, n, b)
    K = tuple(nd + d for nd, d in zip(need, dd))
    return K, c * p, max(K)


def fsub(x: FE, y: FE) -> FE:
    s = x.spec
    assert y.spec is s
    if y.bound > s.mask:
        y = fcarry(y)
    K, K_val, K_max = _sub_bias(s, y.bound, y.vmax.bit_length())
    if x.bound + K_max >= (1 << 32):
        x = fcarry(x)
    out = x.limbs + _const_arr(K, x.limbs.ndim) - y.limbs
    bound = x.bound + K_max
    assert bound < (1 << 32)
    return FE(out, s, bound, x.vmax + K_val)


def fneg(y: FE) -> FE:
    s = y.spec
    if y.bound > s.mask:
        y = fcarry(y)
    K, K_val, K_max = _sub_bias(s, y.bound, y.vmax.bit_length())
    return FE(_const_arr(K, y.limbs.ndim) - y.limbs, s, K_max, K_val)


def fmul_small(x: FE, k: int) -> FE:
    """Multiply by a small non-negative host constant (e.g. 3b in RCB formulas)."""
    if k == 0:
        return fe_zeros(x.spec, x.batch_shape)
    if k == 1:
        return x
    if x.bound * k >= (1 << 32):
        x = fcarry(x)
    assert x.bound * k < (1 << 32)
    return FE(x.limbs * np.uint32(k), x.spec, x.bound * k, x.vmax * k)


# ---------------------------------------------------------------------------
# multiply / square
# ---------------------------------------------------------------------------

def _bshape(x: FE, y: FE):
    return jnp.broadcast_shapes(x.limbs.shape[1:], y.limbs.shape[1:])


def _conv_arr(xl: jax.Array, yl: jax.Array, out_shape) -> jax.Array:
    """Convolution columns col[i+j] += x_i * y_j as n slice-accumulates."""
    n, m = xl.shape[0], yl.shape[0]
    out = jnp.zeros((n + m - 1, *out_shape), U32)
    for i in range(n):
        out = _slice_add(out, i, xl[i] * yl)
    return out


def _sq_arr(xl: jax.Array) -> jax.Array:
    """Symmetric-square columns: 2*x_i*x_j (i<j) + x_i^2.

    One slice-add per limb (row i = x_i * [x_i, 2x_{i+1}, ..] at column 2i)
    — the former diagonal/cross split issued ~2n slice-adds and each is a
    full pad+add pass over the [2n-1, B] buffer (fe._slice_add), making the
    XLA-graph square *slower* than the full mul (BENCHES r2 anomaly)."""
    n = xl.shape[0]
    dbl = xl + xl
    out = jnp.zeros((2 * n - 1,) + xl.shape[1:], U32)
    for i in range(n):
        row = (jnp.concatenate([xl[i:i + 1], dbl[i + 1:]], axis=0)
               if i + 1 < n else xl[i:i + 1])
        out = _slice_add(out, 2 * i, xl[i] * row)
    return out


def _mont_reduce(spec: FieldSpec, cols: jax.Array, in_vmax: int) -> FE:
    """Word-by-word Montgomery reduction of 2n columns -> n limbs, < ~1.1p.

    out = (in + m*p)/R with R = 2^(b*n); out <= in/R + p. The headroom limb makes
    R >= 2^b * p, so chains of adds between multiplies never need extra passes.
    """
    b, n, mask, n0 = spec.limb_bits, spec.n_limbs, spec.mask, spec.n0
    cols = _grow(cols, 2 * n)
    p_arr = _const_arr(spec.p_limbs, cols.ndim)
    bs, ms, n0s = np.uint32(b), np.uint32(mask), np.uint32(n0)
    for i in range(n):
        m = (cols[i] * n0s) & ms
        cols = _slice_add(cols, i, m * p_arr)
        cols = _slice_add(cols, i + 1, (cols[i] >> bs)[None])
    out_vmax = in_vmax // spec.W + spec.p + 1
    assert out_vmax < spec.W
    rows, _ = _carry_scan(cols[n:2 * n], (1 << 32) - 1 - (1 << 21), b, mask)
    return FE(rows, spec, mask, out_vmax)


def fmul(x: FE, y: FE) -> FE:
    s = x.spec
    assert y.spec is s, f"field mismatch {x.spec} vs {y.spec}"
    if x.bound > s.mul_in_bound:
        x = fcarry(x)
    if y.bound > s.mul_in_bound:
        y = fcarry(y)
    cols = _conv_arr(x.limbs, y.limbs, _bshape(x, y))
    col_bound = s.n_limbs * x.bound * y.bound
    if s.kind == "mont":
        assert col_bound + s.n_limbs * (1 << (2 * s.limb_bits)) + (1 << 21) < (1 << 32)
        return _mont_reduce(s, cols, x.vmax * y.vmax)
    assert col_bound < (1 << 32)
    return _solinas_reduce(s, cols, col_bound, x.vmax * y.vmax)


def fsquare(x: FE) -> FE:
    s = x.spec
    if not s.sq_symmetric:
        return fmul(x, x)
    if x.bound > s.sq_in_bound:
        x = fcarry(x)
    cols = _sq_arr(x.limbs)
    col_bound = 2 * s.n_limbs * x.bound * x.bound
    if s.kind == "mont":
        assert col_bound + s.n_limbs * (1 << (2 * s.limb_bits)) + (1 << 21) < (1 << 32)
        return _mont_reduce(s, cols, x.vmax * x.vmax)
    assert col_bound < (1 << 32)
    return _solinas_reduce(s, cols, col_bound, x.vmax * x.vmax)


# ---------------------------------------------------------------------------
# canonicalization, comparison
# ---------------------------------------------------------------------------

def _cond_sub(spec: FieldSpec, cols: jax.Array, m_limbs) -> jax.Array:
    """Constant-time conditional subtract: cols - m if cols >= m else cols."""
    b, mask = spec.limb_bits, spec.mask
    bs, ms, one = np.uint32(b), np.uint32(mask), np.uint32(1)
    radix_minus_m = _const_arr([(1 << b) - ml for ml in m_limbs], cols.ndim)
    radix_minus_m = jnp.broadcast_to(radix_minus_m, cols.shape)

    if UNROLL_SCANS or PALLAS_MODE:
        borrow = jnp.zeros_like(cols[0])
        outs = []
        for j in range(cols.shape[0]):
            t = cols[j] + radix_minus_m[j] - borrow
            outs.append(t & ms)
            borrow = one - (t >> bs)
        ge = borrow == 0
        return jnp.where(ge, jnp.stack(outs, axis=0), cols), ge

    def step(borrow, xs):
        r, rm = xs
        t = r + rm - borrow
        return one - (t >> bs), t & ms

    borrow, sub = jax.lax.scan(
        step, jnp.zeros_like(cols[0]), (cols, radix_minus_m)
    )
    ge = borrow == 0  # no final borrow -> cols >= m
    return jnp.where(ge, sub, cols), ge


def freduce(x: FE, mult: int = 1) -> FE:
    """Constant-time reduce below mult*p (mult a power of two) via conditional
    subtractions of p << i. mult=1 canonicalizes into [0, p)."""
    s = x.spec
    x = fcarry(x)
    cols = x.limbs
    vmax = min(x.vmax, s.W - 1)
    lo = mult.bit_length() - 1
    assert mult == 1 << lo
    i = max(lo, (vmax // s.p).bit_length() - 1)
    while vmax >= mult * s.p and i >= lo:
        m = s.p << i
        if m < s.W:
            cols, _ = _cond_sub(s, cols, int_to_limbs(m, s.n_limbs, s.limb_bits))
            vmax = max(m - 1, vmax - m)
        i -= 1
    assert vmax < mult * s.p
    return FE(cols, s, s.mask, vmax)


def fcanonical(x: FE) -> FE:
    """Fully reduce into [0, p) (internal domain). For serialization/compares."""
    return freduce(x, 1)


def words_from_ints(vals, bits: int) -> np.ndarray:
    """Host ints -> packed little-endian 32-bit words uint32[n_words, B].
    The minimal wire format for the slow host<->device link: 4 bytes/32 bits
    vs 4 bytes/13 bits for limb arrays."""
    nw = (bits + 31) // 32
    N = len(vals)
    if N == 0:
        return np.zeros((nw, 0), np.uint32)
    buf = b"".join(int(v).to_bytes(4 * nw, "little") for v in vals)
    arr = np.frombuffer(buf, "<u4").reshape(N, nw)
    return np.ascontiguousarray(arr.T)


def ints_from_words(arr) -> list[int]:
    """uint32[n_words, B] -> host ints."""
    a = np.ascontiguousarray(np.asarray(arr).T.astype("<u4"))
    return [int.from_bytes(a[i].tobytes(), "little") for i in range(a.shape[0])]


def fe_from_words(spec: FieldSpec, words: jax.Array, value_bits: int,
                  encode: bool = True) -> FE:
    """Device: packed 32-bit words -> FE (Montgomery-encoded on device when the
    spec is 'mont' and encode=True). Keeps host->device traffic minimal."""
    raw = relimb(words, 32, spec.limb_bits, spec.n_limbs)
    vmax = min((1 << value_bits), spec.W) - 1
    fe = FE(raw, spec, spec.mask, vmax)
    if encode and spec.kind == "mont":
        # multiply raw limbs by enc(R) = R^2: raw * R^2 / R = mont(value)
        fe = fmul(fe, fe_from_int(spec, spec.r, words.shape[1:]))
    return fe


def fe_to_words(x: FE, bits: int | None = None) -> jax.Array:
    """Device: FE -> canonical integer packed as 32-bit words (for D2H)."""
    s = x.spec
    bits = bits or s.bits
    raw = fto_raw_canonical(x)
    return relimb(raw, s.limb_bits, 32, (bits + 31) // 32)


def fto_raw_canonical(x: FE) -> jax.Array:
    """Canonical *integer-domain* limbs (Montgomery factor removed) [n, *b]."""
    s = x.spec
    if s.kind == "mont":
        one_raw = FE(_const_arr(int_to_limbs(1, s.n_limbs, s.limb_bits),
                                x.limbs.ndim), s, s.mask, 1)
        x = fmul(x, one_raw)          # (x*R) * 1 / R = x
    return fcanonical(x).limbs


def relimb(limbs: jax.Array, src_b: int, dst_b: int, dst_n: int) -> jax.Array:
    """Repack canonical limbs between limb widths (e.g. 13-bit field limbs ->
    12-bit scalar limbs for P-521 cross-field moves). Static shifts only."""
    src_n = limbs.shape[0]
    masks = np.uint32((1 << dst_b) - 1)
    out = []
    for j in range(dst_n):
        lo, hi = dst_b * j, dst_b * (j + 1)
        acc = None
        for i in range(lo // src_b, min(src_n - 1, (hi - 1) // src_b) + 1):
            base = src_b * i
            if base >= lo:
                t = limbs[i] << np.uint32(base - lo)
            else:
                t = limbs[i] >> np.uint32(lo - base)
            acc = t if acc is None else (acc | t)
        if acc is None:
            acc = jnp.zeros(limbs.shape[1:], U32)
        out.append(acc & masks)
    return jnp.stack(out, axis=0)


def fmul_shift(spec: FieldSpec, u_limbs: jax.Array, g: int,
               shift_limbs: int, out_limbs: int) -> jax.Array:
    """floor(u * g / 2^(b*shift_limbs)) for canonical limbs u (bound <= mask)
    and a host constant g -> limbs uint32[out_limbs, *batch].

    The device analogue of the reference's Scalar::mul_shift_vartime
    (k256/src/arithmetic/scalar.rs:700-744) used by the GLV rounding step —
    here fully branchless (and hence constant-time by construction)."""
    b, mask = spec.limb_bits, spec.mask
    ng = -(-max(g.bit_length(), 1) // b)
    g_arr = _const_arr(int_to_limbs(g, ng, b), u_limbs.ndim)
    col_bound = min(spec.n_limbs, ng) * mask * mask
    assert col_bound < (1 << 32), "fmul_shift columns overflow uint32"
    cols = _conv_arr(u_limbs, g_arr, u_limbs.shape[1:])
    carried, _ = _carry_scan(cols, col_bound, b, mask)
    carried = _grow(carried, shift_limbs + out_limbs)
    return carried[shift_limbs:shift_limbs + out_limbs]


def field_to_scalar_raw(field: FieldSpec, scalar: FieldSpec, x: FE):
    """Field element -> canonical integer limbs mod the group order n.

    Uses p < 2n (Hasse) so a single conditional subtract reduces; returns
    (limbs [ns, *b], was_reduced bool[*batch]) — the flag feeds RecoveryId's
    x-overflow bit (cf. k256/src/ecdsa.rs:192-197).
    """
    assert field.p < 2 * scalar.p
    raw = fto_raw_canonical(x)
    if (field.limb_bits, field.n_limbs) != (scalar.limb_bits, scalar.n_limbs):
        raw = relimb(raw, field.limb_bits, scalar.limb_bits, scalar.n_limbs)
    cols, ge = _cond_sub(scalar, raw,
                         int_to_limbs(scalar.p, scalar.n_limbs, scalar.limb_bits))
    return cols, ge


def feq(x: FE, y: FE) -> jax.Array:
    """Batched equality -> bool[*batch]."""
    xc, yc = fcanonical(x), fcanonical(y)
    return jnp.all(xc.limbs == yc.limbs, axis=0)


def fis_zero(x: FE) -> jax.Array:
    xc = fcanonical(x)
    return jnp.all(xc.limbs == 0, axis=0)


def fselect(mask_arr: jax.Array, a: FE, b: FE) -> FE:
    """where(mask, a, b) elementwise over the batch. mask: bool[*batch]."""
    assert a.spec is b.spec
    return FE(jnp.where(mask_arr, a.limbs, b.limbs), a.spec,
              max(a.bound, b.bound), max(a.vmax, b.vmax))


# ---------------------------------------------------------------------------
# pow / invert / sqrt
# ---------------------------------------------------------------------------

def fone(spec: FieldSpec, batch_shape=()) -> FE:
    return fe_from_int(spec, 1, batch_shape)


def _steady(x: FE) -> FE:
    """Carry and clamp vmax to the spec's steady-state loop invariant."""
    s = x.spec
    x = fcarry(x)
    assert x.vmax <= s.carried_vmax, f"{s.name}: value not steady ({x.vmax.bit_length()}b)"
    return FE(x.limbs, s, s.mask, s.carried_vmax)


def _fpow_kernel_ok(spec: FieldSpec, batch_shape, e: int) -> bool:
    """Route big fixed-exponent chains (Fermat inversion, sqrt exponents)
    through the fused Mosaic pow kernel (pallas_kernels.pow_call); small
    exponents and non-TPU/odd-shaped batches keep the XLA scan below (which
    is also the CPU oracle the kernel is asserted bit-equal against)."""
    import os

    if os.environ.get("TPU_ECC_KERNELS", "1") == "0":
        return False
    if e.bit_length() < 64 or spec.kind not in ("solinas", "mont"):
        return False
    if len(batch_shape) != 1 or batch_shape[0] % 128 != 0:
        return False
    return jax.default_backend() == "tpu"


def fpow_const(x: FE, e: int) -> FE:
    """x^e for a fixed host exponent: 4-bit fixed-window over a scan.

    The window-table select is a masked sum (constant-time by construction); the
    scans keep the jaxpr small — the TPU analogue of the reference's unrolled
    addition chains (k256 field.rs:187-216). Big chains on TPU run as one
    fused Mosaic kernel (pallas_kernels.pow_call) instead.
    """
    s = x.spec
    if e == 0:
        return fone(s, x.batch_shape)
    if e == 1:
        return x
    x = _steady(x)
    if _fpow_kernel_ok(s, x.batch_shape, e):
        from . import pallas_kernels as PK

        limbs = jnp.broadcast_to(x.limbs, (s.n_limbs, x.batch_shape[0]))
        out = PK.pow_call(s, e, x.batch_shape[0])(limbs)
        return FE(out, s, s.mask, s.carried_vmax)
    x_l = jnp.broadcast_to(x.limbs, x.limbs.shape)
    one_l = jnp.broadcast_to(fone(s, x.batch_shape).limbs, x.limbs.shape)

    # table[t] = x^t for t in 0..15, built by a scan of 14 multiplies
    def tstep(prev, _):
        nxt = _steady(fmul(fe_steady(s, prev), x))
        return nxt.limbs, nxt.limbs

    _, tail = jax.lax.scan(tstep, x_l, None, length=14)
    tbl_arr = jnp.concatenate([one_l[None], x_l[None], tail], axis=0)  # [16,n,*b]

    ndig = -(-e.bit_length() // 4)
    digits = np.array([(e >> (4 * i)) & 15 for i in range(ndig)][::-1], np.uint32)

    def body(acc_limbs, digit):
        acc = fe_steady(s, acc_limbs)
        for _ in range(4):
            acc = _steady(fsquare(acc))
        shape = (16,) + (1,) * acc_limbs.ndim
        sel_mask = jnp.arange(16, dtype=U32).reshape(shape) == digit
        sel = jnp.sum(jnp.where(sel_mask, tbl_arr, np.uint32(0)), axis=0, dtype=U32)
        acc = _steady(fmul(acc, fe_steady(s, sel)))
        return acc.limbs, None

    acc_limbs = tbl_arr[int(digits[0])]
    if ndig > 1:
        acc_limbs, _ = jax.lax.scan(body, acc_limbs, jnp.asarray(digits[1:]))
    return fe_steady(s, acc_limbs)


def finv(x: FE) -> FE:
    """Constant-time Fermat inversion x^(p-2); maps 0 -> 0 (callers mask the
    CtOption-none case separately, as with the reference's invert)."""
    return fpow_const(x, x.spec.p - 2)


def fbatch_inv(x: FE) -> FE:
    """Batched Montgomery-trick inversion over the last batch axis.

    x_i^-1 = prefix_i * suffix_i * total^-1 with prefix/suffix exclusive
    products from two associative scans — O(B log B) muls at log-depth vs
    B independent Fermat chains (the scan analogue of BatchInvert,
    primeorder/src/projective.rs:382-413). Zeros map to zero.
    """
    s = x.spec
    x = _steady(x)
    zero_mask = fis_zero(x)
    one = fone(s, x.batch_shape)
    x = fselect(zero_mask, one, x)  # mask zeros to 1 (reference :394-399)
    limbs = x.limbs

    def combine(a, b):
        return _steady(fmul(fe_steady(s, a), fe_steady(s, b))).limbs

    incl = jax.lax.associative_scan(combine, limbs, axis=-1)
    total = fe_steady(s, incl[..., -1:])
    tinv = finv(total)  # [n, ..., 1]
    # exclusive prefix: shift inclusive right by one, seed with 1
    one_col = jnp.broadcast_to(one.limbs[..., :1], limbs[..., :1].shape)
    excl_prefix = jnp.concatenate([one_col, incl[..., :-1]], axis=-1)
    # suffix product via reversed scan
    incl_r = jax.lax.associative_scan(combine, limbs[..., ::-1], axis=-1)[..., ::-1]
    excl_suffix = jnp.concatenate([incl_r[..., 1:], one_col], axis=-1)
    out = fmul(fe_steady(s, excl_prefix), fe_steady(s, excl_suffix))
    out = _steady(fmul(out, FE(jnp.broadcast_to(tinv.limbs, limbs.shape),
                               s, s.mask, s.carried_vmax)))
    return fselect(zero_mask, fe_zeros(s, x.batch_shape), out)


@functools.lru_cache(maxsize=None)
def _ts_constants(spec: FieldSpec):
    """Tonelli–Shanks constants: p-1 = q * 2^s with q odd; z = a non-residue."""
    p = spec.p
    q, s_ = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s_ += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    return q, s_, z


def fsqrt(x: FE):
    """Batched square root. Returns (root, is_square: bool[*batch]).

    p = 3 mod 4: single power (p+1)/4 (cf. p192/src/arithmetic/field.rs:103-107,
    k256 field.rs:220-255). Otherwise constant-time Tonelli–Shanks with a fixed
    iteration structure (cf. p224 field sqrt, k256 scalar.rs:290-327).
    """
    s = x.spec
    p = s.p
    if p % 4 == 3:
        r = fpow_const(x, (p + 1) // 4)
        ok = feq(fsquare(r), x)
        return r, ok

    q, s2, znr = _ts_constants(s)
    x = _steady(x)
    c = _steady(fe_from_int(s, pow(znr, q, p), x.batch_shape))
    t = fpow_const(x, q)                  # order divides 2^(s2-1) for squares
    r = fpow_const(x, (q + 1) // 2)
    one = fone(s, x.batch_shape)

    def outer(k, state):
        t_l, r_l, c_l = state
        t_, r_, c_ = fe_steady(s, t_l), fe_steady(s, r_l), fe_steady(s, c_l)
        i = s2 - k                        # i runs s2 .. 2

        # b = t^(2^(i-2)) via masked repeated squaring (fixed trip count)
        def inner(j, b_l):
            bsq = _steady(fsquare(fe_steady(s, b_l)))
            return jnp.where(j < i - 2, bsq.limbs, b_l)

        b_l = jax.lax.fori_loop(0, s2 - 2, inner, t_.limbs)
        flag = jnp.logical_not(feq(fe_steady(s, b_l), one))
        c2 = _steady(fsquare(c_))
        r_new = _steady(fmul(r_, c_))
        t_new = _steady(fmul(t_, c2))
        r_ = fselect(flag, r_new, r_)
        t_ = fselect(flag, t_new, t_)
        return (t_.limbs, r_.limbs, c2.limbs)

    state = (t.limbs, jnp.broadcast_to(r.limbs, x.limbs.shape), c.limbs)
    state = jax.lax.fori_loop(0, s2 - 1, outer, state)
    r = fe_steady(s, state[1])
    ok = feq(fsquare(r), x)
    return r, ok
