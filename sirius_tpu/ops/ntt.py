"""Radix-2 NTT over limbed prime fields (device, limb-first).

TPU-native replacement for reference `src/fft.rs` (SURVEY.md §2.1).  The
recursive rayon strategy becomes an iterative vectorized butterfly ladder:
each of the k stages is one batched Montgomery multiply + add/sub over the
whole (row-shardable) domain, compiled into a single XLA program.

Layout: the ladder runs LIMB-FIRST (uint32[L, n], rows on the 128-wide
vector lanes) — the same layout lesson as every other hot op here: limb-last
puts the 16 limbs on the lanes (12.5% utilization), limb-first puts the 2^k
rows there.  The public API stays limb-last (n, L) at the boundary with one
transpose pass each way; `fft_lf` exposes the native limb-first entry.

Stage scheduling details that matter on TPU:
- the m==1 stage multiplies by omega^0 == 1, so it is a pure add/sub (no
  Montgomery mul) — k stages cost (k-1) * n/2 muls total;
- twiddles for every stage are precomputed host-side into one table per
  direction and sliced statically, so the compiled program has no gathers
  beyond the initial bit-reverse permutation;
- the inverse scaling by 1/2^k fuses into the final stage's twiddle table
  (t = hi * (w/n), lo' = lo/n) — saving a full-domain mul pass.

Semantics (bit-exact targets, verified against the gold model and the
reference's inline vector `src/fft.rs:241-252`):
- omega = ROOT_OF_UNITY^(2^(S-k)) (`fft.rs:12-23`)
- ifft scales by 1/2^k (`fft.rs:25-27,168-182`)
- coset fft/ifft distribute zeta^(i mod 3) powers (`fft.rs:186-228`)
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import gold
from ..fields.constants import NUM_LIMBS, FieldSpec
from ..fields.jfield import Field, field_for
from ..fields.jfield_lf import lf_for, to_lf, from_lf

L = NUM_LIMBS


def _bit_reverse_indices(k: int) -> np.ndarray:
    n = 1 << k
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev


class NTT:
    """Per-(field, k) NTT context with precomputed twiddle tables."""

    def __init__(self, field: Field, k: int):
        assert k <= field.spec.two_adicity
        self.f = field
        self.lf = lf_for(field)
        self.k = k
        self.n = 1 << k
        p = field.p
        omega = gold.omega_for_k(field.spec, k)
        omega_inv = pow(omega, -1, p)
        n_inv = pow(self.n, -1, p)

        def powers_lf(base: int, count: int, scale: int = 1) -> np.ndarray:
            vals, acc = [], scale % p
            for _ in range(count):
                vals.append(acc)
                acc = acc * base % p
            return np.asarray(field.encode(vals)).T.copy()  # (L, count)

        half = max(self.n // 2, 1)
        self.w_table = powers_lf(omega, half)  # (L, half): omega^j, j < n/2
        self.w_inv_table = powers_lf(omega_inv, half)
        # last-stage inverse twiddles pre-scaled by 1/n (fuses the ifft scale)
        self.w_inv_scaled = powers_lf(omega_inv, half, scale=n_inv)
        self.rev_idx = _bit_reverse_indices(k)
        self.n_inv_col = np.asarray(field.encode([n_inv])).T.copy()  # (L, 1)
        zeta = field.spec.zeta
        # zeta^(i mod 3) and inverse patterns over the domain (limb-first)
        zpow = [pow(zeta, i % 3, p) for i in range(self.n)]
        zpow_inv = [pow(zeta, (-(i % 3)) % 3, p) for i in range(self.n)]
        self.zeta_pows = np.asarray(field.encode(zpow)).T.copy()
        self.zeta_inv_pows = np.asarray(field.encode(zpow_inv)).T.copy()

        self.fft = jax.jit(self._fft, static_argnames=("inverse",))
        self.fft_lf = jax.jit(self._fft_lf_impl, static_argnames=("inverse",))
        self.coset_fft = jax.jit(self._coset_fft)
        self.coset_ifft = jax.jit(self._coset_ifft)

    # -- limb-first core -------------------------------------------------------
    def _ladder(self, al: jnp.ndarray, inverse: bool) -> jnp.ndarray:
        """al: (L, n) bit-reversed input -> (L, n) natural-order output."""
        lf, n = self.lf, self.n
        table = jnp.asarray(self.w_inv_table if inverse else self.w_table)
        last = jnp.asarray(self.w_inv_scaled) if inverse else table
        m = 1
        while m < n:
            nb = n // (2 * m)
            view = al.reshape(L, nb, 2, m)
            lo, hi = view[:, :, 0], view[:, :, 1]
            if m == 1 and n > 2:
                # twiddle == omega^0 == 1: butterfly without the mul
                t = hi
            else:
                tab = last if 2 * m == n else table
                w = tab[:, :: nb][:, :m]  # (L, m)
                t = lf.mul(hi, w[:, None, :])
                if 2 * m == n and inverse:
                    # fold the 1/n scale into lo as well
                    lo = lf.mul(lo, jnp.asarray(self.n_inv_col)[:, None, :])
            al = jnp.stack([lf.add(lo, t), lf.sub(lo, t)], axis=2).reshape(L, n)
            m *= 2
        if inverse and n <= 2:
            al = lf.mul(al, jnp.asarray(self.n_inv_col))
        return al

    def _fft_lf_impl(self, al: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
        """al: (L, n) standard or Montgomery form (linear map either way)."""
        assert al.shape == (L, self.n)
        return self._ladder(al[:, jnp.asarray(self.rev_idx)], inverse)

    # -- limb-last public API --------------------------------------------------
    def _fft(self, a: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
        """a: (n, L) standard or Montgomery form (linear map either way)."""
        assert a.shape[0] == self.n
        return from_lf(self._fft_lf_impl(to_lf(a), inverse))

    def ifft(self, a):
        return self.fft(a, inverse=True)

    def ifft_lf(self, al):
        return self.fft_lf(al, inverse=True)

    def _coset_fft(self, a):
        al = self.lf.mul(to_lf(a), jnp.asarray(self.zeta_pows))
        return from_lf(self._ladder(al[:, jnp.asarray(self.rev_idx)], False))

    def _coset_ifft(self, a):
        al = self._fft_lf_impl(to_lf(a), inverse=True)
        return from_lf(self.lf.mul(al, jnp.asarray(self.zeta_inv_pows)))


@lru_cache(maxsize=None)
def ntt_ctx(spec: FieldSpec, k: int) -> NTT:
    return NTT(field_for(spec), k)
