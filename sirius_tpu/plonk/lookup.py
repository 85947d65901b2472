"""Protostar log-derivative lookup arguments.

Replaces reference `src/plonk/lookup.rs` (SURVEY.md §2.3).  Per lookup i the
five per-row vectors are (l, t, m, h, g):

    l = L_i(x..)  compressed input expression      (vanishes vs witness var l)
    t = T_i(y..)  compressed table expression
    m_i = multiplicity of t_i among {l_j} (first occurrence only)
    h = 1/(l + r)
    g = m/(t + r)
    sum h == sum g   (log-derivative identity)

l/t evaluation is row-parallel on device.  The multiplicity count has two
paths: a host hashmap (the reference semantics, used as gold and for tiny
tables) and a device sort/search kernel (SURVEY.md §2.8 item "m-count
becomes sort/segment-sum"): lexicographic sort of t's limbs, stable so the
sorted group head is the first original occurrence, then a vectorized
leftmost binary search of every l row and a scatter-add of ones.  h/g use
the device Montgomery batch inversion.
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


def _lex_less(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Row-wise lexicographic a < b over little-endian limb rows (n, L)."""
    L = a.shape[-1]
    lt = jnp.zeros(a.shape[0], bool)
    decided = jnp.zeros(a.shape[0], bool)
    for i in reversed(range(L)):  # most-significant limb first
        ai, bi = a[:, i], b[:, i]
        lt = jnp.where(~decided & (ai < bi), True, lt)
        decided = decided | (ai != bi)
    return lt


@jax.jit
def _device_m_count(l_enc: jnp.ndarray, t_enc: jnp.ndarray) -> jnp.ndarray:
    """m per original t row: count of l rows equal to it, attributed to the
    first occurrence only (bit-identical to the host hashmap semantics —
    counting depends only on equality, which the canonical limb encoding
    preserves)."""
    n, L = t_enc.shape
    # stable lexsort, most-significant limb as primary key -> within an
    # equal group, original indices ascend, so the group head IS the first
    # original occurrence
    order = jnp.lexsort(tuple(t_enc[:, i] for i in range(L)))
    ts = t_enc[order]
    head = jnp.any(ts != jnp.roll(ts, 1, axis=0), axis=1).at[0].set(True)

    # leftmost binary search of each l row in the sorted table
    steps = max(n.bit_length(), 1)
    lo = jnp.zeros((l_enc.shape[0],), jnp.int32)
    hi = jnp.full((l_enc.shape[0],), n, jnp.int32)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        lt = _lex_less(ts[jnp.clip(mid, 0, n - 1)], l_enc)
        take = (lo < hi) & lt
        return jnp.where(take, mid + 1, lo), jnp.where((lo < hi) & ~lt, mid, hi)

    lo, hi = jax.lax.fori_loop(0, steps + 1, body, (lo, hi))
    pos = jnp.clip(lo, 0, n - 1)
    found = jnp.all(ts[pos] == l_enc, axis=1) & (lo < n)
    counts_sorted = jnp.zeros((n,), jnp.int32).at[
        jnp.where(found, pos, n)
    ].add(1, mode="drop")
    return jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.where(head, counts_sorted, 0)
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
        l_devs = list(outs[: self.num_lookups()])
        t_devs = list(outs[self.num_lookups() :])
        ls = [f.decode(o) for o in l_devs]
        ts = [f.decode(o) for o in t_devs]

        # m: count of l's equal to t_i, first-occurrence-of-t only
        # (reference `evaluate_m`, hashmap semantics).  Device path for
        # real table sizes; host hashmap (the gold model) for tiny ones.
        import os

        flag = os.environ.get("SIRIUS_TPU_DEVICE_LOOKUP")
        use_device = (n >= 4096) if flag is None else flag == "1"
        ms = []
        for l, t, l_dev, t_dev in zip(ls, ts, l_devs, t_devs):
            if use_device:
                ms.append([int(v) for v in _device_m_count(l_dev, t_dev)])
                continue
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
        return ArgumentCoefficient1(self, S, ls, ts, ms, l_devs, t_devs)


@dataclass
class ArgumentCoefficient1:
    """(l, t, m) vectors (reference `lookup.rs:346-366`)."""

    args: LookupArguments
    S: object
    ls: list[list[int]]
    ts: list[list[int]]
    ms: list[list[int]]
    l_devs: list = None
    t_devs: list = None

    def evaluate_coefficient_2(self, r: int) -> "ArgumentCoefficient2":
        """h = 1/(l+r), g = m/(t+r), zeros on zero denominators
        (reference `evaluate_h_g`)."""
        import os

        f = self.S.field
        p = f.p
        n = self.S.n
        flag = os.environ.get("SIRIUS_TPU_DEVICE_LOOKUP")
        use_device = (
            self.l_devs is not None
            and ((n >= 4096) if flag is None else flag == "1")
        )
        hs, gs = [], []
        for i, (l, t, m) in enumerate(zip(self.ls, self.ts, self.ms)):
            if use_device:
                r_b = jnp.broadcast_to(f.encode([r % p])[0], self.l_devs[i].shape)
                h_dev = f.batch_inv(f.add(self.l_devs[i], r_b))
                tinv = f.batch_inv(f.add(self.t_devs[i], r_b))
                g_dev = f.mul(f.encode([mi % p for mi in m]), tinv)
                hs.append(f.decode(h_dev))
                gs.append(f.decode(g_dev))
                continue
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
