"""Dense univariate polynomials over a prime field (host ints).

Replaces reference `src/polynomial/univariate.rs` (SURVEY.md §2.1).  These
polys are small (degree ~ number of FFT points in ProtoGalaxy's F/G/K), so
the host bignum path is the right tool; batched device evaluation uses the
compiled field kernels where it matters.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from ..fields.constants import FieldSpec
from ..fields import gold


@dataclass
class UnivariatePoly:
    """coeffs[i] is the coefficient of X^i."""

    spec: FieldSpec
    coeffs: list[int]

    @classmethod
    def zero(cls, spec: FieldSpec, n: int = 0) -> "UnivariatePoly":
        return cls(spec, [0] * n)

    def __len__(self):
        return len(self.coeffs)

    def degree(self) -> int:
        for i in range(len(self.coeffs) - 1, -1, -1):
            if self.coeffs[i] % self.spec.modulus != 0:
                return i
        return 0

    def eval(self, x: int) -> int:
        """Horner evaluation (reference `univariate.rs:67-75`)."""
        p = self.spec.modulus
        acc = 0
        for c in reversed(self.coeffs):
            acc = (acc * x + c) % p
        return acc

    def add(self, other: "UnivariatePoly") -> "UnivariatePoly":
        p = self.spec.modulus
        n = max(len(self.coeffs), len(other.coeffs))
        a = self.coeffs + [0] * (n - len(self.coeffs))
        b = other.coeffs + [0] * (n - len(other.coeffs))
        return UnivariatePoly(self.spec, [(x + y) % p for x, y in zip(a, b)])

    def mul(self, other: "UnivariatePoly") -> "UnivariatePoly":
        """Schoolbook product (reference `univariate.rs:96-120`); inputs are
        tiny setup-time polys."""
        p = self.spec.modulus
        if not self.coeffs or not other.coeffs:
            return UnivariatePoly(self.spec, [])
        out = [0] * (len(self.coeffs) + len(other.coeffs) - 1)
        for i, a in enumerate(self.coeffs):
            if a == 0:
                continue
            for j, b in enumerate(other.coeffs):
                out[i + j] = (out[i + j] + a * b) % p
        return UnivariatePoly(self.spec, out)

    def scale(self, k: int) -> "UnivariatePoly":
        p = self.spec.modulus
        return UnivariatePoly(self.spec, [c * k % p for c in self.coeffs])

    def padded(self, n: int) -> "UnivariatePoly":
        assert n >= len(self.coeffs)
        return UnivariatePoly(self.spec, self.coeffs + [0] * (n - len(self.coeffs)))

    def trim(self) -> "UnivariatePoly":
        d = self.degree()
        return UnivariatePoly(self.spec, [c % self.spec.modulus for c in self.coeffs[: d + 1]])

    # -- FFT bridges (reference `univariate.rs:170-178`) -----------------------
    def coset_fft_values(self) -> list[int]:
        n = 1 << (len(self.coeffs) - 1).bit_length() if len(self.coeffs) > 1 else 1
        return gold.coset_fft(self.padded(max(n, len(self.coeffs))).coeffs, self.spec)

    @classmethod
    def from_coset_values(cls, spec: FieldSpec, values: Sequence[int]) -> "UnivariatePoly":
        return cls(spec, gold.coset_ifft(values, spec))
