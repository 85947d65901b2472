"""Shared fixture circuits (analogue of reference `src/nifs/tests.rs`)."""

from __future__ import annotations

from dataclasses import dataclass

from sirius_tpu.frontend.circuit import Assignment, ConstraintSystemBuilder


@dataclass
class SquareCircuit:
    """Single-gate circuit: s * (a^2 - b) = 0 per row; b chained to next a.

    Exercises the 0-challenge SPS path (single gate, no lookup).
    instances: [x0, x_{2^iters}] as the 2-marker column.
    """

    x0: int
    iters: int = 6

    def configure(self, cs: ConstraintSystemBuilder):
        a = cs.advice_column()
        b = cs.advice_column()
        s = cs.selector()
        inst = cs.instance_column()
        sa, qa, qb = cs.query(s), cs.query(a), cs.query(b)
        cs.create_gate("square", [sa * (qa * qa - qb)])
        return (a, b, s, inst)

    def synthesize(self, config, asn: Assignment):
        a, b, s, inst = config
        p = asn.p
        x = self.x0 % p
        for row in range(self.iters):
            asn.enable_selector(s, row)
            asn.assign_advice(a, row, x)
            x = x * x % p
            asn.assign_advice(b, row, x)
            if row + 1 < self.iters:
                asn.assign_advice(a, row + 1, x)
                asn.copy(b, row, a, row + 1)
        # markers: input and output exposed
        asn.copy(a, 0, inst, 0)
        asn.copy(b, self.iters - 1, inst, 1)

    def instances(self, p: int) -> list[list[int]]:
        x = self.x0 % p
        out = x
        for _ in range(self.iters):
            out = out * out % p
        return [[self.x0 % p, out]]


@dataclass
class FiboCircuit:
    """Two-gate circuit (reference `fibo_circuit`, `nifs/tests.rs:76`):
    s*(a2 - b1 - a1), s*(b2 - a2 - b1); exercises the 1-challenge SPS path."""

    a: int
    b: int
    num: int

    def configure(self, cs: ConstraintSystemBuilder):
        col_a = cs.advice_column()
        col_b = cs.advice_column()
        s = cs.selector()
        inst = cs.instance_column()
        sq = cs.query(s)
        a1, b1 = cs.query(col_a, -1), cs.query(col_b, -1)
        a2, b2 = cs.query(col_a), cs.query(col_b)
        cs.create_gate("fibo-block", [sq * (a2 - b1 - a1), sq * (b2 - a2 - b1)])
        return (col_a, col_b, s, inst)

    def synthesize(self, config, asn: Assignment):
        col_a, col_b, s, inst = config
        p = asn.p
        nrows = (self.num + 1) // 2
        a, b = self.a % p, self.b % p
        asn.assign_advice(col_a, 0, a)
        asn.assign_advice(col_b, 0, b)
        for idx in range(1, nrows):
            asn.enable_selector(s, idx)
            a2 = (a + b) % p
            b2 = (a2 + b) % p
            asn.assign_advice(col_a, idx, a2)
            asn.assign_advice(col_b, idx, b2)
            a, b = a2, b2
        asn.copy(col_b, nrows - 1, inst, 0)

    def instances(self, p: int) -> list[list[int]]:
        nrows = (self.num + 1) // 2
        a, b = self.a % p, self.b % p
        for _ in range(1, nrows):
            a2 = (a + b) % p
            b2 = (a2 + b) % p
            a, b = a2, b2
        return [[b, 0]]


XOR_BITS = 2  # 2-bit XOR table: 16 rows, fits K >= 4


@dataclass
class FiboXorLookupCircuit:
    """Fibonacci-with-XOR chain via a vector lookup (reference
    `fibo_circuit_with_lookup`, `nifs/tests.rs:232`): each row proves
    c = a XOR b with (a, b, c) looked up in a fixed 3-column XOR table.
    Exercises the 3-round SPS / vector-lookup path under folding."""

    a: int
    b: int
    num: int

    def configure(self, cs: ConstraintSystemBuilder):
        col_a = cs.advice_column()
        col_b = cs.advice_column()
        col_c = cs.advice_column()
        s = cs.selector()
        t_a = cs.fixed_column()
        t_b = cs.fixed_column()
        t_c = cs.fixed_column()
        inst = cs.instance_column()
        sq = cs.query(s)
        cs.lookup(
            [sq * cs.query(col_a), sq * cs.query(col_b), sq * cs.query(col_c)],
            [cs.query(t_a), cs.query(t_b), cs.query(t_c)],
        )
        # chain gate: next a = b, next b = c (keeps a non-lookup gate in play)
        a2, b2 = cs.query(col_a, 1), cs.query(col_b, 1)
        cs.create_gate(
            "xor-chain", [sq * (a2 - cs.query(col_b)), sq * (b2 - cs.query(col_c))]
        )
        return (col_a, col_b, col_c, s, t_a, t_b, t_c, inst)

    def _seq(self, p: int):
        mask = (1 << XOR_BITS) - 1
        a, b = self.a & mask, self.b & mask
        rows = []
        for _ in range(self.num):
            c = a ^ b
            rows.append((a, b, c))
            a, b = b, c
        return rows

    def synthesize(self, config, asn: Assignment):
        col_a, col_b, col_c, s, t_a, t_b, t_c, inst = config
        n = 1 << XOR_BITS
        for x in range(n):
            for y in range(n):
                row = x * n + y
                asn.assign_fixed(t_a, row, x)
                asn.assign_fixed(t_b, row, y)
                asn.assign_fixed(t_c, row, x ^ y)
        rows = self._seq(asn.p)
        for idx, (a, b, c) in enumerate(rows):
            if idx + 1 < len(rows):
                asn.enable_selector(s, idx)
            asn.assign_advice(col_a, idx, a)
            asn.assign_advice(col_b, idx, b)
            asn.assign_advice(col_c, idx, c)
        asn.copy(col_c, len(rows) - 1, inst, 0)

    def instances(self, p: int) -> list[list[int]]:
        return [[self._seq(p)[-1][2], 0]]
