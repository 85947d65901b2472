"""Expression IR: homogenization snapshots (mirroring reference
`expression.rs:530-606`), degree, fold-transform, grouping, evaluator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sirius_tpu.fields.jfield import FR
from sirius_tpu.poly.expression import (
    Challenge,
    Constant,
    Poly,
    Query,
    QueryIndexContext,
    compress_expression,
)
from sirius_tpu.poly.evaluator import evaluate_expressions, rotate_rows
from sirius_tpu.poly.grouped import GroupedPoly


def advice(i, rot=0):
    return Poly(Query(i, rot))


def test_visualize_matches_reference_format():
    expr1 = advice(0) - Constant(1)
    expr2 = advice(0) * 2
    expr = expr1 * expr1 + expr2
    assert expr.visualize() == "(Z_0 - 0x1) * (Z_0 - 0x1) + 0x2 * Z_0"


def test_homogeneous_simple():
    """Reference `test_homogeneous_simple` snapshot."""
    ctx = QueryIndexContext(num_advice=2)
    a, b = advice(0), advice(1)
    expr3 = (a + Constant(1)) + a * b
    h = expr3.homogeneous(ctx)
    assert h.expr.visualize() == "(Z_0 + 0x1 * r_0) * r_0 + Z_0 * Z_1"
    assert h.degree == 2


def test_homogeneous_deep():
    """Reference `test_homogeneous` snapshot."""
    ctx = QueryIndexContext(num_advice=5)
    a, b, c, d, e = (advice(i) for i in range(5))
    expr = a + (a * b) + (a * b * c) + (a * b * c * d * e)
    h = expr.homogeneous(ctx)
    assert (
        h.expr.visualize()
        == "((Z_0 * r_0 + Z_0 * Z_1) * r_0 + Z_0 * Z_1 * Z_2) * r_0 * r_0 + Z_0 * Z_1 * Z_2 * Z_3 * Z_4"
    )
    assert h.degree == 5


def test_degree_and_challenges():
    ctx = QueryIndexContext(num_selectors=1, num_fixed=1, num_advice=2, num_challenges=1)
    s, f, a, b = Poly(Query(0)), Poly(Query(1)), Poly(Query(2)), Poly(Query(3))
    r = Challenge(0)
    e = s * (a * b) + f * a * r
    assert e.degree(ctx) == 2
    assert e.num_challenges() == 1


def test_compress_expression_order():
    """Earlier gates get higher challenge powers (plonk/util.rs fold)."""
    e0, e1, e2 = advice(0), advice(1), advice(2)
    c = compress_expression([e0, e1, e2], 5)
    # e2 + (e1 + e0*y)*y
    assert c.visualize() == "Z_2 + (Z_1 + (Z_0 + 0x0 * r_5) * r_5) * r_5"


def test_grouped_poly_cross_terms():
    """P = a*b over 2 advice: terms (a1*b1, a1*b2 + a2*b1, a2*b2)."""
    ctx = QueryIndexContext(num_advice=2)
    g = GroupedPoly.new(advice(0) * advice(1), ctx)
    assert len(g) == 3
    assert g.terms[0].visualize() == "Z_0 * Z_1"
    assert g.terms[1].visualize() == "Z_0 * Z_3 + Z_2 * Z_1"
    assert g.terms[2].visualize() == "Z_2 * Z_3"


def test_grouped_poly_matches_fold_substitution(rng):
    """Numeric check: sum_d r^d * terms_d == homogeneous(x + r*y)."""
    ctx = QueryIndexContext(num_advice=2, num_challenges=1)
    a, b, u = advice(0), advice(1), Challenge(0)
    expr = a * b + a * u
    g = GroupedPoly.new(expr, ctx)

    p = FR.p
    xs = {0: 3, 1: 5}
    ys = {0: 7, 1: 11}
    ch_x, ch_y, r = 13, 17, 19

    def eval_expr(e, polys, chs):
        from sirius_tpu.poly.expression import Constant as C, Poly as P, Challenge as Ch, Neg, Sum, Product, Scaled

        return e.evaluate(
            constant=lambda c: c % p,
            poly=lambda q: polys[q.index] % p,
            challenge=lambda i: chs[i] % p,
            negated=lambda v: -v % p,
            sum=lambda x, y: (x + y) % p,
            product=lambda x, y: x * y % p,
            scaled=lambda v, k: v * k % p,
        )

    # folded assignment: x_i + r*y_i via grouped terms
    polys = {0: xs[0], 1: xs[1], 2: ys[0], 3: ys[1]}
    chs = {0: ch_x, 1: ch_y}
    grouped_val = 0
    for d, t in enumerate(g.terms):
        if t is not None:
            grouped_val = (grouped_val + pow(r, d, p) * eval_expr(t, polys, chs)) % p

    direct = eval_expr(
        expr,
        {0: (xs[0] + r * ys[0]) % p, 1: (xs[1] + r * ys[1]) % p},
        {0: (ch_x + r * ch_y) % p},
    )
    assert grouped_val == direct


def test_evaluator_rows():
    """Row-parallel evaluation matches per-row python ints, incl. rotations."""
    n = 8
    p = FR.p
    ctx = QueryIndexContext(num_advice=2)
    col0 = [int(i * i + 1) for i in range(n)]
    col1 = [int(3 * i + 2) for i in range(n)]
    cols = {0: FR.encode(col0), 1: FR.encode(col1)}
    expr = advice(0, rot=1) * advice(1) - Constant(4)

    def resolve_poly(q):
        return rotate_rows(cols[q.index], q.rotation)

    out = jax.jit(
        lambda: evaluate_expressions(FR, [expr], resolve_poly, lambda i: None)[0]
    )()
    got = FR.decode(out)
    want = [(col0[(i + 1) % n] * col1[i] - 4) % p for i in range(n)]
    assert got == want
