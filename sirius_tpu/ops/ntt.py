"""Radix-2 NTT over limbed prime fields (device).

TPU-native replacement for reference `src/fft.rs` (SURVEY.md §2.1).  The
recursive rayon strategy becomes an iterative vectorized butterfly ladder:
each of the k stages is one batched Montgomery multiply + add/sub over the
whole (row-shardable) domain, compiled into a single XLA program.

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
from ..fields.constants import NUM_LIMBS
from ..fields.jfield import Field, field_for
from ..fields.constants import FieldSpec
from ..fields import limb as limbutil


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
        self.k = k
        self.n = 1 << k
        p = field.p
        omega = gold.omega_for_k(field.spec, k)
        omega_inv = pow(omega, -1, p)

        def powers(base: int, count: int) -> np.ndarray:
            vals, acc = [], 1
            for _ in range(count):
                vals.append(acc)
                acc = acc * base % p
            return np.asarray(field.encode(vals))

        half = max(self.n // 2, 1)
        self.w_table = powers(omega, half)  # omega^j, j < n/2
        self.w_inv_table = powers(omega_inv, half)
        self.rev_idx = _bit_reverse_indices(k)
        self.n_inv = np.asarray(field.encode([pow(self.n, -1, p)]))[0]
        zeta = field.spec.zeta
        # zeta^(i mod 3) and inverse patterns over the domain
        zpow = [pow(zeta, i % 3, p) for i in range(self.n)]
        zpow_inv = [pow(zeta, (-(i % 3)) % 3, p) for i in range(self.n)]
        self.zeta_pows = np.asarray(field.encode(zpow))
        self.zeta_inv_pows = np.asarray(field.encode(zpow_inv))

        self.fft = jax.jit(self._fft_impl, static_argnames=("inverse",))
        self.coset_fft = jax.jit(self.coset_fft)
        self.coset_ifft = jax.jit(self.coset_ifft)

    def _fft_impl(self, a: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
        """a: (n, L) standard or Montgomery form (linear map either way)."""
        f, n, k = self.f, self.n, self.k
        assert a.shape[0] == n
        table = jnp.asarray(self.w_inv_table if inverse else self.w_table)
        a = a[jnp.asarray(self.rev_idx)]
        m = 1
        while m < n:
            # blocks of 2m; twiddles omega^(j * n/(2m)) for j < m
            w = table[:: n // (2 * m)][:m]  # (m, L)
            view = a.reshape(n // (2 * m), 2 * m, NUM_LIMBS)
            lo, hi = view[:, :m], view[:, m:]
            t = f.mul(hi, w[None])
            a = jnp.concatenate([f.add(lo, t), f.sub(lo, t)], axis=1).reshape(n, NUM_LIMBS)
            m *= 2
        if inverse:
            a = f.mul(a, jnp.asarray(self.n_inv)[None])
        return a

    def ifft(self, a):
        return self.fft(a, inverse=True)

    def coset_fft(self, a):
        f = self.f
        return self._fft_impl(f.mul(a, jnp.asarray(self.zeta_pows)))

    def coset_ifft(self, a):
        f = self.f
        return f.mul(self._fft_impl(a, inverse=True), jnp.asarray(self.zeta_inv_pows))


@lru_cache(maxsize=None)
def ntt_ctx(spec: FieldSpec, k: int) -> NTT:
    return NTT(field_for(spec), k)
