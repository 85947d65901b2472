"""Pallas TPU kernel: fused incomplete mixed EC addition (madd-2007-bl).

The XLA lowering of one mixed add is ~11 Montgomery multiplies, each of
which materializes (lanes, 16) intermediates between HLO ops; fusing the
whole add into one Pallas kernel keeps every limb row in VMEM/registers.

Layout: limb-FIRST — each coordinate is (L, S, 128) uint32 (limbs on the
leading axis; trailing (S, 128) are full TPU tiles), vs the (n, L) layout
of the jnp path.  `madd_tiles` converts.

Semantics mirror `fields.jfield.Field` (CIOS, lazy carries) and
`curves.jpoint.Curve.add_mixed_fast` exactly: Q must be affine (z = 1),
non-identity, and != +-P; P may be the identity (z = 0).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..curves.jpoint import Curve, Points
from ..fields.constants import LIMB_BITS, NUM_LIMBS

L = NUM_LIMBS
LB = LIMB_BITS
MASK = np.uint32((1 << LB) - 1)
LANE = 128
SUB_BLK = 8  # (L, SUB_BLK, 128) blocks


def _rows(spec_limbs):
    return [np.uint32(x) for x in spec_limbs]


class _F:
    """Limb-first field ops over lists of (S, 128) uint32 arrays."""

    def __init__(self, fs):
        self.p = _rows(fs.p_limbs)
        self.notp = _rows(fs.not_p_limbs)
        self.n0inv = np.uint32(fs.n0inv)
        self.one_mont = _rows(fs.one_mont_limbs)

    @staticmethod
    def _ripple(rows):
        out, c = [], jnp.zeros_like(rows[0])
        for r in rows:
            s = r + c
            out.append(s & MASK)
            c = s >> LB
        return out, c

    def _cond_sub_p(self, r):
        t = [x + np_ for x, np_ in zip(r, self.notp)]
        t[0] = t[0] + 1
        d, co = self._ripple(t)
        ge = co > 0
        return [jnp.where(ge, x, y) for x, y in zip(d, r)]

    def add(self, a, b):
        r, _ = self._ripple([x + y for x, y in zip(a, b)])
        return self._cond_sub_p(r)

    def double(self, a):
        return self.add(a, a)

    def sub(self, a, b):
        t = [x + (y ^ MASK) for x, y in zip(a, b)]
        t[0] = t[0] + 1
        d, co = self._ripple(t)
        d2, _ = self._ripple([x + pj for x, pj in zip(d, self.p)])
        ge = co > 0
        return [jnp.where(ge, x, y) for x, y in zip(d, d2)]

    def mul(self, a, b):
        z = jnp.zeros_like(a[0])
        t = [z for _ in range(L + 1)]
        for i in range(L):
            ai = a[i]
            for j in range(L):
                prod = ai * b[j]
                t[j] = t[j] + (prod & MASK)
                t[j + 1] = t[j + 1] + (prod >> LB)
            m = ((t[0] & MASK) * self.n0inv) & MASK
            for j in range(L):
                q = m * self.p[j]
                t[j] = t[j] + (q & MASK)
                t[j + 1] = t[j + 1] + (q >> LB)
            carry0 = t[0] >> LB
            t = [t[1] + carry0] + t[2:] + [jnp.zeros_like(t[0])]
        r, _ = self._ripple(t)
        return self._cond_sub_p(r[:L])

    def square(self, a):
        return self.mul(a, a)


def _madd_core(f: _F, X, Y, Z, QX, QY):
    """Incomplete mixed add on limb-lists; returns (x3, y3, z3) limb-lists.
    P == identity (z == 0) falls back to Q (z = 1 mont).  Same contract as
    `Curve.add_mixed_fast`."""
    z1z1 = f.square(Z)
    u2 = f.mul(QX, z1z1)
    t = f.mul(QY, Z)
    s2 = f.mul(t, z1z1)
    h = f.sub(u2, X)
    rr = f.double(f.sub(s2, Y))
    hh = f.square(h)
    zh = f.add(Z, h)
    zh2 = f.square(zh)
    r2 = f.square(rr)
    i4 = f.double(f.double(hh))
    j = f.mul(h, i4)
    v = f.mul(X, i4)
    x3 = f.sub(f.sub(r2, j), f.double(v))
    a = f.mul(rr, f.sub(v, x3))
    b = f.mul(Y, j)
    y3 = f.sub(a, f.double(b))
    z3 = f.sub(f.sub(zh2, z1z1), hh)

    # P == identity (z == 0 across all limbs) -> result is Q (z = 1 mont)
    p_inf = Z[0] == 0
    for i in range(1, L):
        p_inf = p_inf & (Z[i] == 0)
    x3 = [jnp.where(p_inf, QX[i], x3[i]) for i in range(L)]
    y3 = [jnp.where(p_inf, QY[i], y3[i]) for i in range(L)]
    z3 = [jnp.where(p_inf, jnp.full_like(z3[i], f.one_mont[i]), z3[i]) for i in range(L)]
    return x3, y3, z3


def _madd_kernel(f, x_ref, y_ref, z_ref, qx_ref, qy_ref, ox_ref, oy_ref, oz_ref):
    from .limb_kernels import k_madd_incomplete

    x3, y3, z3 = k_madd_incomplete(
        f, x_ref[:], y_ref[:], z_ref[:], qx_ref[:], qy_ref[:]
    )
    ox_ref[:] = x3
    oy_ref[:] = y3
    oz_ref[:] = z3


@lru_cache(maxsize=None)
def _madd_call(curve: Curve, S: int, interpret: bool = False):
    from .limb_kernels import KF

    f = KF(curve.fb)
    blk = min(SUB_BLK, S)
    grid = (S // blk,)
    spec = pl.BlockSpec((L, blk, LANE), lambda s: (0, s, 0), memory_space=pltpu.VMEM)

    def kern(*refs):
        _madd_kernel(f, *refs)

    shape = jax.ShapeDtypeStruct((L, S, LANE), jnp.uint32)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec] * 5,
        out_specs=[spec] * 3,
        out_shape=[shape] * 3,
        interpret=interpret,
    )


def to_limb_first(arr: jnp.ndarray) -> jnp.ndarray:
    """(n, L) -> (L, n/128, 128); n must be a multiple of 128."""
    n = arr.shape[0]
    return jnp.transpose(arr, (1, 0)).reshape(L, n // LANE, LANE)


def from_limb_first(arr: jnp.ndarray) -> jnp.ndarray:
    Ldim, S, _ = arr.shape
    return jnp.transpose(arr.reshape(Ldim, S * LANE), (1, 0))


def madd_tiles(curve: Curve, P: Points, qx: jnp.ndarray, qy: jnp.ndarray,
               interpret: bool = False) -> Points:
    """Mixed add over (n, L) inputs via the Pallas kernel (n % 128 == 0)."""
    n = P.x.shape[0]
    S = n // LANE
    call = _madd_call(curve, S, interpret)
    ox, oy, oz = call(
        to_limb_first(P.x), to_limb_first(P.y), to_limb_first(P.z),
        to_limb_first(qx), to_limb_first(qy),
    )
    return Points(from_limb_first(ox), from_limb_first(oy), from_limb_first(oz))
