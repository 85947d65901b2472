"""Protostar log-derivative lookup arguments.

Replaces reference `src/plonk/lookup.rs` (SURVEY.md §2.3).  Per lookup i the
five per-row vectors are (l, t, m, h, g):

    l = L_i(x..)  compressed input expression      (vanishes vs witness var l)
    t = T_i(y..)  compressed table expression
    m_i = multiplicity of t_i among {l_j} (first occurrence only)
    h = 1/(l + r)
    g = m/(t + r)
    sum h == sum g   (log-derivative identity)

l/t evaluation is row-parallel on device; the multiplicity count and h/g use
host ints + device batch-invert for now (sort/segment-sum device path is a
planned kernel; SURVEY.md §2.8 item "m-count becomes sort/segment-sum").
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..poly.evaluator import evaluate_expressions, rotate_rows
from ..poly.expression import (
    Challenge,
    Constant,
    Expression,
    Poly,
    Query,
    compress_expression,
)


@dataclass
class LookupArguments:
    """Compressed lookup/table polys (reference `lookup.rs:73-130`)."""

    lookup_polys: list[Expression]
    table_polys: list[Expression]
    has_vector_lookup: bool

    @staticmethod
    def compress_from(lookups: Sequence[tuple[Sequence[Expression], Sequence[Expression]]]) -> Optional["LookupArguments"]:
        """lookups: list of (input_exprs, table_exprs) already in the global
        index space.  Vector lookups compress with Challenge(0) = r1."""
        if not lookups:
            return None
        max_len = max(len(inp) for inp, _ in lookups)
        if max_len == 0:
            return None
        has_vector = max_len > 1
        lookup_polys = [compress_expression(list(inp), 0) for inp, _ in lookups]
        table_polys = [compress_expression(list(tbl), 0) for _, tbl in lookups]
        return LookupArguments(lookup_polys, table_polys, has_vector)

    def num_lookups(self) -> int:
        return len(self.lookup_polys)

    # -- synthesized constraint expressions (reference `lookup.rs:141-198`) ----
    def vanishing_lookup_polys(self, lookup_offset: int) -> list[Expression]:
        ls = [
            L - Poly(Query(lookup_offset + i * 5, 0))
            for i, L in enumerate(self.lookup_polys)
        ]
        ts = [
            T - Poly(Query(lookup_offset + i * 5 + 1, 0))
            for i, T in enumerate(self.table_polys)
        ]
        return ls + ts

    def log_derivative_lhs_and_rhs(self, lookup_offset: int) -> list[Expression]:
        challenge_index = 1 if self.has_vector_lookup else 0
        out = []
        for i in range(self.num_lookups()):
            r = Challenge(challenge_index)
            l, t, m, h, g = (
                Poly(Query(lookup_offset + i * 5 + j, 0)) for j in range(5)
            )
            out.append(h * (l + r) - Constant(1))
            out.append(g * (t + r) - m)
        return out

    def to_expressions(self, lookup_offset: int) -> list[Expression]:
        return self.vanishing_lookup_polys(lookup_offset) + self.log_derivative_lhs_and_rhs(
            lookup_offset
        )

    # -- prover coefficient passes (reference `lookup.rs:213-320`) -------------
    def evaluate_coefficient_1(self, S, advice_cols: list[list[int]], r: int):
        """Evaluate l, t per row and count multiplicities m.

        advice_cols: host ints per advice column.  Returns ArgumentCoefficient1.
        """
        f = S.field
        p = f.p
        n = S.n

        # build a resolver over structure + advice (LookupEvalDomain semantics:
        # queries resolve selectors/fixed then advice columns directly)
        import numpy as np

        adv_dev = (
            f.encode([v for col in advice_cols for v in col]).reshape(
                len(advice_cols), n, -1
            )
            if advice_cols
            else jnp.zeros((0, n, 16), jnp.uint32)
        )
        num_sel = S.selectors.shape[0]
        num_fixed = len(S.fixed_columns)
        r_dev = f.encode([r % p])[0]

        def resolve_poly(q: Query):
            idx = q.index
            if idx < num_sel:
                col = S.selectors_device[idx]
            elif idx < num_sel + num_fixed:
                col = S.fixed_device[idx - num_sel]
            else:
                col = adv_dev[idx - num_sel - num_fixed]
            return rotate_rows(col, q.rotation)

        outs = evaluate_expressions(
            f, self.lookup_polys + self.table_polys, resolve_poly, lambda i: r_dev
        )
        ls = [f.decode(o) for o in outs[: self.num_lookups()]]
        ts = [f.decode(o) for o in outs[self.num_lookups() :]]

        # m: count of l's equal to t_i, first-occurrence-of-t only
        # (reference `evaluate_m`, hashmap semantics)
        ms = []
        for l, t in zip(ls, ts):
            counts: dict[int, int] = {}
            for li in l:
                counts[li] = counts.get(li, 0) + 1
            seen: set[int] = set()
            m = []
            for ti in t:
                if ti in seen:
                    m.append(0)
                else:
                    seen.add(ti)
                    m.append(counts.get(ti, 0))
            ms.append(m)
        return ArgumentCoefficient1(self, S, ls, ts, ms)


@dataclass
class ArgumentCoefficient1:
    """(l, t, m) vectors (reference `lookup.rs:346-366`)."""

    args: LookupArguments
    S: object
    ls: list[list[int]]
    ts: list[list[int]]
    ms: list[list[int]]

    def evaluate_coefficient_2(self, r: int) -> "ArgumentCoefficient2":
        """h = 1/(l+r), g = m/(t+r), zeros on zero denominators
        (reference `evaluate_h_g`)."""
        p = self.S.field.p
        hs, gs = [], []
        for l, t, m in zip(self.ls, self.ts, self.ms):
            from ..fields.gold import batch_inv

            h = batch_inv([(li + r) % p for li in l], p)
            ginv = batch_inv([(ti + r) % p for ti in t], p)
            g = [mi * gi % p for mi, gi in zip(m, ginv)]
            hs.append(h)
            gs.append(g)
        return ArgumentCoefficient2(self, hs, gs)


@dataclass
class ArgumentCoefficient2:
    c1: ArgumentCoefficient1
    hs: list[list[int]]
    gs: list[list[int]]
