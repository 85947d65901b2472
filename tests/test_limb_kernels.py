"""Array-limb kernel primitives vs the jfield/gold reference (pure jnp on
CPU — the same code Pallas kernels trace on TPU)."""

import numpy as np
import jax.numpy as jnp

from sirius_tpu.curves.jpoint import BN256_G1
from sirius_tpu.fields import gold
from sirius_tpu.fields.jfield import FQ
from sirius_tpu.ops.limb_kernels import (
    KF,
    k_add_complete,
    k_dbl,
    k_madd_incomplete,
)


def _lf(arr):
    return jnp.transpose(jnp.asarray(arr), (1, 0))  # (n, L) -> (L, n)


def _from_lf(arr):
    return jnp.transpose(arr, (1, 0))


def test_field_ops_match_jfield():
    rng = np.random.default_rng(3)
    n = 64
    a = FQ.random((n,), rng)
    b = FQ.random((n,), rng)
    f = KF(FQ)
    for name, kf_fn, jf_fn in (
        ("add", f.add, FQ.add),
        ("sub", f.sub, FQ.sub),
        ("mul", f.mul, FQ.mul),
    ):
        got = _from_lf(kf_fn(_lf(a), _lf(b)))
        want = jf_fn(a, b)
        assert np.array_equal(np.asarray(got), np.asarray(want)), name


def _rand_points(rng, n):
    """Random affine curve points (Montgomery-encoded device arrays)."""
    g = gold.generator(BN256_G1.spec)
    pts = [g.mul(int(rng.integers(1, 1 << 62))) for _ in range(n)]
    xs = FQ.encode([p.x for p in pts])
    ys = FQ.encode([p.y for p in pts])
    return pts, xs, ys


def test_complete_add_matches_gold():
    rng = np.random.default_rng(5)
    n = 16
    pts1, x1, y1 = _rand_points(rng, n)
    pts2, x2, y2 = _rand_points(rng, n)
    # include identity / doubling / inverse edge cases
    f = KF(FQ)
    one = f.one_arr((n,))
    Z1 = jnp.broadcast_to(jnp.transpose(one, (0, 1)), (16, n))
    P = (_lf(x1), _lf(y1), one)
    Q = (_lf(x2), _lf(y2), one)
    X3, Y3, Z3 = k_add_complete(f, P, Q)
    # decode jacobian -> affine and compare to gold
    from sirius_tpu.curves.jpoint import Points

    got = BN256_G1.decode(Points(_from_lf(X3), _from_lf(Y3), _from_lf(Z3)))
    want = [a.add(b) for a, b in zip(pts1, pts2)]
    assert got == want

    # doubling case (P == Q)
    X3, Y3, Z3 = k_add_complete(f, P, P)
    got = BN256_G1.decode(Points(_from_lf(X3), _from_lf(Y3), _from_lf(Z3)))
    want = [a.double() for a in pts1]
    assert got == want

    # identity + inverse-pair cases
    zero = jnp.zeros_like(one)
    I = (zero, one, zero)
    X3, Y3, Z3 = k_add_complete(f, I, Q)
    got = BN256_G1.decode(Points(_from_lf(X3), _from_lf(Y3), _from_lf(Z3)))
    assert got == pts2
    negQ = (_lf(x2), _lf(FQ.neg(y2)), one)
    X3, Y3, Z3 = k_add_complete(f, Q, negQ)
    got = BN256_G1.decode(Points(_from_lf(X3), _from_lf(Y3), _from_lf(Z3)))
    assert all(p.is_identity for p in got)


def test_madd_incomplete_matches_gold():
    rng = np.random.default_rng(7)
    n = 16
    pts1, x1, y1 = _rand_points(rng, n)
    pts2, x2, y2 = _rand_points(rng, n)
    f = KF(FQ)
    one = f.one_arr((n,))
    X3, Y3, Z3 = k_madd_incomplete(f, _lf(x1), _lf(y1), one, _lf(x2), _lf(y2))
    from sirius_tpu.curves.jpoint import Points

    got = BN256_G1.decode(Points(_from_lf(X3), _from_lf(Y3), _from_lf(Z3)))
    want = [a.add(b) for a, b in zip(pts1, pts2)]
    assert got == want

    # P = identity falls back to Q
    zero = jnp.zeros_like(one)
    X3, Y3, Z3 = k_madd_incomplete(f, zero, zero, zero, _lf(x2), _lf(y2))
    got = BN256_G1.decode(Points(_from_lf(X3), _from_lf(Y3), _from_lf(Z3)))
    assert got == pts2


def test_dbl_matches_gold():
    rng = np.random.default_rng(9)
    n = 8
    pts, xs, ys = _rand_points(rng, n)
    f = KF(FQ)
    one = f.one_arr((n,))
    X3, Y3, Z3 = k_dbl(f, _lf(xs), _lf(ys), one)
    from sirius_tpu.curves.jpoint import Points

    got = BN256_G1.decode(Points(_from_lf(X3), _from_lf(Y3), _from_lf(Z3)))
    assert got == [p.double() for p in pts]
