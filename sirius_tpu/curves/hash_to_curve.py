"""Deterministic hash-to-curve (Shallue–van de Woestijne, RFC 9380 §6.6.1).

Used by commitment-key setup (reference `src/commitment.rs:55-79` feeds
Shake256 XOF output through halo2curves' `hash_to_curve`).  We implement the
standard SVDW map with Z chosen per curve; the derivation is self-consistent
and deterministic but not byte-identical to halo2curves' pipeline (which is
pinned to a specific halo2 fork rev); see PARITY.md.
"""

from __future__ import annotations

from functools import lru_cache

from ..fields.constants import CurveSpec
from ..fields.gold import AffinePoint, identity
from ..fields.constants import FieldSpec


def _is_square(a: int, p: int) -> bool:
    return a % p == 0 or pow(a, (p - 1) // 2, p) == 1


def _sqrt(a: int, p: int) -> int:
    from .hash_to_curve import _tonelli  # self

    return _tonelli(a % p, p)


def _tonelli(a: int, p: int) -> int:
    if a == 0:
        return 0
    assert _is_square(a, p)
    if p % 4 == 3:
        return pow(a, (p + 1) // 4, p)
    s, q = 0, p - 1
    while q % 2 == 0:
        s += 1
        q //= 2
    z = 2
    while _is_square(z, p):
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        i, t2i = 0, t
        while t2i != 1:
            t2i = t2i * t2i % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c, t, r = i, b * b % p, t * b * b % p, r * b % p
    return r


@lru_cache(maxsize=None)
def _svdw_constants(curve: CurveSpec) -> tuple[int, int, int, int, int]:
    """(Z, c1, c2, c3, c4) per RFC 9380 §6.6.1."""
    p = curve.base.modulus
    A, B = curve.a, curve.b

    def g(x):
        return (pow(x, 3, p) + A * x + B) % p

    # smallest Z by the RFC's criteria, searched as 1, -1, 2, -2, ...
    candidates = []
    for mag in range(1, 50):
        candidates += [mag, p - mag]
    for Z in candidates:
        gz = g(Z)
        denom = (3 * Z * Z + 4 * A) % p
        if gz == 0 or denom == 0:
            continue
        # -(3Z^2+4A)/(4g(Z)) must be a nonzero square <=> -(3Z^2+4A)*g(Z) square
        c3_sq = (-gz % p) * denom % p
        if not _is_square(c3_sq, p):
            continue
        # at least one of g(Z), g(-Z/2) must be square
        if not (_is_square(gz, p) or _is_square(g((-Z * pow(2, -1, p)) % p), p)):
            continue
        c1 = gz
        c2 = (-Z * pow(2, -1, p)) % p
        c3 = _tonelli(c3_sq, p)
        if c3 % 2 == 1:  # sgn0(c3) must be 0
            c3 = p - c3
        c4 = (-4 * gz % p) * pow(denom, -1, p) % p
        return Z, c1, c2, c3, c4
    raise ValueError(f"no SVDW Z found for {curve.name}")


def svdw_map(curve: CurveSpec, u: int) -> AffinePoint:
    """RFC 9380 map_to_curve_svdw."""
    p = curve.base.modulus
    A, B = curve.a, curve.b
    Z, c1, c2, c3, c4 = _svdw_constants(curve)

    def inv0(x):
        return pow(x, -1, p) if x % p else 0

    u %= p
    tv1 = u * u % p * c1 % p
    tv2 = (1 + tv1) % p
    tv1 = (1 - tv1) % p
    tv3 = inv0(tv1 * tv2 % p)
    tv4 = u * tv1 % p * tv3 % p * c3 % p
    x1 = (c2 - tv4) % p
    gx1 = (pow(x1, 3, p) + A * x1 + B) % p
    x2 = (c2 + tv4) % p
    gx2 = (pow(x2, 3, p) + A * x2 + B) % p
    x3 = (pow(tv2, 2, p) * tv3 % p) ** 2 % p * c4 % p + Z
    x3 %= p
    if _is_square(gx1, p):
        x, gx = x1, gx1
    elif _is_square(gx2, p):
        x, gx = x2, gx2
    else:
        x = x3
        gx = (pow(x, 3, p) + A * x + B) % p
    y = _tonelli(gx, p)
    if (u % 2) != (y % 2):  # sgn0 match
        y = p - y
    return AffinePoint(curve, x, y)


def hash_bytes_to_point(curve: CurveSpec, uniform: bytes) -> AffinePoint:
    """64 uniform bytes -> point: two field elements -> SVDW -> sum
    (standard hash_to_curve composition for uniform encodings)."""
    assert len(uniform) == 64
    p = curve.base.modulus
    u0 = int.from_bytes(uniform[:32], "little") % p
    u1 = int.from_bytes(uniform[32:], "little") % p
    return svdw_map(curve, u0).add(svdw_map(curve, u1))
