"""Polynomial utilities: lagrange basis identities (reference
`lagrange.rs:95-128`), univariate ops, sparse matvec, digest determinism."""

import numpy as np

from sirius_tpu.fields import gold
from sirius_tpu.fields.constants import bn256_fr, bn256_g1
from sirius_tpu.fields.jfield import FR
from sirius_tpu.poly import lagrange
from sirius_tpu.poly.sparse import DeviceSparse, matrix_multiply
from sirius_tpu.poly.univariate import UnivariatePoly
from sirius_tpu.util.digest import digest_ints_to_bits, digest_to_curve

P = bn256_fr.modulus


def test_lagrange_identity_on_subgroup():
    """L_i(w^j) = delta_ij (reference `lagrange.rs:95-128`)."""
    log_n = 3
    pts = list(lagrange.iter_cyclic_subgroup(bn256_fr, log_n))
    for j, x in enumerate(pts):
        ls = list(lagrange.iter_eval_lagrange_poly_for_cyclic_group(bn256_fr, x, log_n))
        assert ls == [1 if i == j else 0 for i in range(8)]


def test_lagrange_partition_of_unity():
    log_n = 2
    x = 0xDEADBEEF
    ls = list(lagrange.iter_eval_lagrange_poly_for_cyclic_group(bn256_fr, x, log_n))
    assert sum(ls) % P == 1


def test_vanishing_poly():
    log_n = 3
    for x in lagrange.iter_cyclic_subgroup(bn256_fr, log_n):
        assert lagrange.eval_vanish_polynomial(bn256_fr, log_n, x) == 0
    assert lagrange.eval_vanish_polynomial(bn256_fr, log_n, 5) == (pow(5, 8, P) - 1) % P


def test_univariate_ops():
    a = UnivariatePoly(bn256_fr, [1, 2, 3])
    b = UnivariatePoly(bn256_fr, [5, 7])
    assert a.eval(10) == 321
    assert a.mul(b).eval(10) == 321 * 75
    assert a.add(b).eval(10) == 321 + 75
    assert a.scale(3).eval(10) == 963
    assert a.padded(6).degree() == 2
    # interpolation roundtrip via fft
    vals = gold.fft(a.padded(4).coeffs, bn256_fr)
    back = gold.fft(vals, bn256_fr, inverse=True)
    assert back == a.padded(4).coeffs


def test_sparse_matvec_device_vs_gold(rng):
    triplets = [(0, 1, 3), (1, 0, 2), (1, 2, 5), (2, 2, 1), (0, 0, 7)]
    z = [int(x) for x in rng.integers(1, 2**61, size=3)]
    want = matrix_multiply(triplets, z, P, num_rows=3)
    dev = DeviceSparse(FR, triplets, num_rows=3)
    got = FR.decode(dev.matvec(FR.encode(z)))
    assert got == want


def test_digest_determinism():
    """Reference `digest.rs:90-...`: same input -> same point; different
    input -> different point; 250-bit truncation."""
    d1 = digest_ints_to_bits([b"hello", b"world"])
    d2 = digest_ints_to_bits([b"hello", b"world"])
    d3 = digest_ints_to_bits([b"hello", b"worlds"])
    assert d1 == d2 != d3
    assert d1 < 1 << 250
    p1 = digest_to_curve(bn256_g1, [b"hello"])
    assert not p1.is_identity
    assert p1 == digest_to_curve(bn256_g1, [b"hello"])
