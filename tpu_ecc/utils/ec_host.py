"""Host-side (Python-int) elliptic curve arithmetic.

Textbook affine Weierstrass formulas over Python ints. Used for:
- precomputing fixed-base tables at trace time,
- the test oracle (the analogue of the reference's proptest BigUint model),
- host-side protocol glue where a single point op is cheaper than a device call.

Never used in batched device paths.
"""

from __future__ import annotations


def aff_add(curve, P, Q):
    """Affine add; points are (x, y) tuples or None for identity."""
    p = curve.p
    if P is None:
        return Q
    if Q is None:
        return P
    x1, y1 = P
    x2, y2 = Q
    if x1 == x2:
        if (y1 + y2) % p == 0:
            return None
        lam = (3 * x1 * x1 + curve.a) * pow(2 * y1, -1, p) % p
    else:
        lam = (y2 - y1) * pow(x2 - x1, -1, p) % p
    x3 = (lam * lam - x1 - x2) % p
    y3 = (lam * (x1 - x3) - y1) % p
    return (x3, y3)


def aff_mul(curve, k: int, P):
    """Scalar multiply (host, variable-time — never touches secrets on device)."""
    k %= curve.n
    acc = None
    add = P
    while k:
        if k & 1:
            acc = aff_add(curve, acc, add)
        add = aff_add(curve, add, add)
        k >>= 1
    return acc


def aff_generator(curve):
    return (curve.gx, curve.gy)


def on_curve(curve, P) -> bool:
    if P is None:
        return True
    x, y = P
    p = curve.p
    return (y * y - (x * x * x + curve.a * x + curve.b)) % p == 0


def decompress(curve, x: int, y_odd: bool):
    """SEC1 point decompression on the host. Returns (x, y) or None."""
    p = curve.p
    alpha = (x * x * x + curve.a * x + curve.b) % p
    if p % 4 == 3:
        y = pow(alpha, (p + 1) // 4, p)
    else:
        y = _mod_sqrt(alpha, p)
        if y is None:
            return None
    if (y * y) % p != alpha:
        return None
    if (y & 1) != int(y_odd):
        y = p - y
    return (x, y)


def _mod_sqrt(a: int, p: int):
    """Tonelli-Shanks (host, variable-time)."""
    if a == 0:
        return 0
    if pow(a, (p - 1) // 2, p) != 1:
        return None
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    c = pow(z, q, p)
    t = pow(a, q, p)
    r = pow(a, (q + 1) // 2, p)
    m = s
    while t != 1:
        i, t2 = 0, t
        while t2 != 1:
            t2 = t2 * t2 % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, b * b % p
        t = t * c % p
        r = r * b % p
    return r
