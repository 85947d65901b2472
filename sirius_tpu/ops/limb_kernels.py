"""Array-limb field/EC primitives for Pallas TPU kernels.

Values are (L, *S) uint32 arrays — limbs on the LEADING axis as one array,
not a Python list of L arrays.  Semantically identical to
`pallas_madd._F` / `pallas_msm._lf_*`, but each field op traces ~8x fewer
jax primitives: the per-limb Python-list form cost ~13 s of TRACING per
Pallas kernel instantiation (measured on the MSM merge tree — 7 levels,
91 s, the bulk of every cold MSM compile), which recurs per process per
shape and is not covered by the persistent XLA cache.

All ops are elementwise over the trailing dims (VPU) with the sequential
carry/CIOS structure expressed over the leading limb axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.constants import LIMB_BITS, NUM_LIMBS

L = NUM_LIMBS
LB = LIMB_BITS
MASK = np.uint32((1 << LB) - 1)


class KF:
    """Montgomery field ops over (L, *S) uint32 arrays (CIOS, lazy carries;
    mirrors `fields.jfield.Field` exactly)."""

    def __init__(self, fs, roll_mul: bool = False):
        self.p = np.asarray(fs.p_limbs, np.uint32)
        self.notp = np.asarray(fs.not_p_limbs, np.uint32)
        self.n0inv = np.uint32(fs.n0inv)
        self.one_mont = np.asarray(fs.one_mont_limbs, np.uint32)
        # roll_mul: CIOS rounds as a fori_loop instead of 16x unrolled.
        # ~16x fewer Mosaic instructions per field mul — for kernels whose
        # COMPILE time dominates (the 1024->1 group merge measured 579 s
        # to compile unrolled through the remote tunnel); the hot
        # bucket-accumulation kernel stays unrolled (throughput-bound).
        self.roll_mul = roll_mul

    @staticmethod
    def _c(vec, shape):
        """(L,) consts at full (L, *shape), assembled IN-TRACE from python
        scalars: Pallas kernels may not close over constant arrays, and
        Mosaic cannot broadcast a (L,1,..,1) vector across sublanes+lanes —
        full-shape scalar fills are supported and constant-folded."""
        return jnp.stack([jnp.full(tuple(shape), np.uint32(v), jnp.uint32) for v in vec])

    @staticmethod
    def _ripple(t):
        """Carry-propagate over the leading axis; returns (limbs, carry)."""
        outs = []
        c = jnp.zeros_like(t[0])
        for j in range(t.shape[0]):
            s = t[j] + c
            outs.append(s & MASK)
            c = s >> LB
        return jnp.stack(outs), c

    def _cond_sub_p(self, r):
        t = r + self._c(self.notp, r.shape[1:])
        t = jnp.concatenate([(t[0] + 1)[None], t[1:]])
        d, co = self._ripple(t)
        return jnp.where((co > 0)[None], d, r)

    def add(self, a, b):
        r, _ = self._ripple(a + b)
        return self._cond_sub_p(r)

    def sub(self, a, b):
        t = a + (b ^ MASK)
        t = jnp.concatenate([(t[0] + 1)[None], t[1:]])
        d, co = self._ripple(t)
        d2, _ = self._ripple(d + self._c(self.p, d.shape[1:]))
        return jnp.where((co > 0)[None], d, d2)

    def double(self, a):
        return self.add(a, a)

    def mul(self, a, b):
        S = a.shape[1:]
        zero1 = jnp.zeros((1,) + S, jnp.uint32)
        t = jnp.zeros((L + 1,) + S, jnp.uint32)
        p = self._c(self.p, a.shape[1:])

        def round_(t, ai):
            prod = ai[None] * b  # (L, *S) exact uint32
            t = t + jnp.concatenate([prod & MASK, zero1]) \
                  + jnp.concatenate([zero1, prod >> LB])
            m = ((t[0] & MASK) * self.n0inv) & MASK
            q = m[None] * p
            t = t + jnp.concatenate([q & MASK, zero1]) \
                  + jnp.concatenate([zero1, q >> LB])
            carry0 = t[0] >> LB
            return jnp.concatenate([(t[1] + carry0)[None], t[2:], zero1])

        if self.roll_mul:
            # Mosaic has no dynamic_slice on kernel values: rotate `a` by
            # one limb per round and always read row 0 (pltpu.roll is
            # supported; the leading axis is untiled so the roll is cheap)
            from jax.experimental.pallas import tpu as pltpu

            def rolled(i, carry):
                t, arot = carry
                t = round_(t, arot[0])
                # pltpu.roll requires non-negative shift: L-1 forward == 1 backward
                return (t, pltpu.roll(arot, L - 1, axis=0))

            t, _ = jax.lax.fori_loop(0, L, rolled, (t, a))
        else:
            for i in range(L):
                t = round_(t, a[i])
        r, _ = self._ripple(t)
        return self._cond_sub_p(r[:L])

    def square(self, a):
        return self.mul(a, a)

    # -- point helpers ----------------------------------------------------------
    def one_arr(self, shape):
        # full-shape per-limb fills: Mosaic cannot broadcast a rank-4
        # (L,1,1,1) vector constant, and scalar fills are free
        return jnp.stack(
            [jnp.full(tuple(shape), np.uint32(v), jnp.uint32) for v in self.one_mont]
        )


def k_is_zero(a):
    return jnp.all(a == 0, axis=0)


def k_eq(a, b):
    return jnp.all(a == b, axis=0)


def k_select(cond, a, b):
    return jnp.where(cond[None], a, b)


def k_identity(f: KF, shape):
    zero = jnp.zeros((L,) + tuple(shape), jnp.uint32)
    return zero, f.one_arr(shape), zero


def k_dbl(f: KF, X, Y, Z):
    """Jacobian doubling, a=0 (dbl-2009-l); identity-safe (z3 = 2*y*z)."""
    A = f.square(X)
    Bq = f.square(Y)
    C = f.square(Bq)
    T = f.square(f.add(X, Bq))
    D = f.double(f.sub(f.sub(T, A), C))
    E = f.add(f.double(A), A)
    Fv = f.square(E)
    x3 = f.sub(Fv, f.double(D))
    y3 = f.sub(f.mul(E, f.sub(D, x3)), f.double(f.double(f.double(C))))
    z3 = f.double(f.mul(Y, Z))
    return x3, y3, z3


def k_add_complete(f: KF, P, Q):
    """Complete Jacobian addition (mirror of `Curve.add`): identities,
    doubling and inverse pairs handled by select."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    z1z1 = f.square(Z1)
    z2z2 = f.square(Z2)
    u1 = f.mul(X1, z2z2)
    u2 = f.mul(X2, z1z1)
    s1 = f.mul(f.mul(Y1, Z2), z2z2)
    s2 = f.mul(f.mul(Y2, Z1), z1z1)
    h = f.sub(u2, u1)
    r = f.sub(s2, s1)
    hh = f.square(h)
    r2 = f.square(r)
    hhh = f.mul(h, hh)
    v = f.mul(u1, hh)
    x3 = f.sub(f.sub(r2, hhh), f.double(v))
    y3 = f.sub(f.mul(r, f.sub(v, x3)), f.mul(s1, hhh))
    z3 = f.mul(f.mul(Z1, Z2), h)

    p_inf = k_is_zero(Z1)
    q_inf = k_is_zero(Z2)
    h_zero = k_is_zero(h)
    r_zero = k_is_zero(r)
    dbl_case = h_zero & r_zero & ~p_inf & ~q_inf
    inf_case = h_zero & ~r_zero & ~p_inf & ~q_inf

    out = (x3, y3, z3)
    dblP = k_dbl(f, X1, Y1, Z1)
    out = tuple(k_select(dbl_case, a, b) for a, b in zip(dblP, out))
    ident = k_identity(f, x3.shape[1:])
    out = tuple(k_select(inf_case, a, b) for a, b in zip(ident, out))
    out = tuple(k_select(q_inf, a, b) for a, b in zip(P, out))
    out = tuple(k_select(p_inf, a, b) for a, b in zip(Q, out))
    return out


def k_madd_incomplete(f: KF, X, Y, Z, QX, QY):
    """Incomplete mixed add (madd-2007-bl): Q affine non-identity, != +-P;
    P == identity (z == 0) falls back to Q.  Mirrors
    `pallas_madd._madd_core` exactly."""
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

    p_inf = k_is_zero(Z)
    x3 = k_select(p_inf, QX, x3)
    y3 = k_select(p_inf, QY, y3)
    z3 = k_select(p_inf, f.one_arr(Z.shape[1:]), z3)
    return x3, y3, z3
