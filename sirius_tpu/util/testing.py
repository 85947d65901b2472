"""Test doubles.

MockCommitmentKey: a *homomorphic but binding-free* commitment —
commit(w) = (sum_i w_i) * G.  It satisfies the linearity every folding
identity relies on (commit(w1 + r*w2) = commit(w1) + r*commit(w2)), so the
whole NIFS/IVC pipeline is exercised bit-for-bit on CPU without the MSM
cost.  NEVER use outside tests: it is trivially non-binding.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..curves.jpoint import Curve
from ..fields import gold


@dataclass
class MockCommitmentKey:
    curve: Curve
    max_len: int = 1 << 40

    def __len__(self):
        return self.max_len

    def commit_device(self, w_mont, window_bits=None):
        f = self.curve.fs
        s = f.decode_one(f.sum_reduce(w_mont)) if w_mont.shape[0] else 0
        return gold.generator(self.curve.spec).mul(s)

    def commit(self, v_ints, window_bits=None):
        s = sum(v % self.curve.fs.p for v in v_ints) % self.curve.fs.p
        return gold.generator(self.curve.spec).mul(s)
