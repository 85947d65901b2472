"""Field arithmetic: JAX limbed Montgomery kernels vs python-int gold model."""

import numpy as np
import pytest

from sirius_tpu.fields import gold
from sirius_tpu.fields.constants import bn256_fq, bn256_fr, pasta_fp, pasta_fq
from sirius_tpu.fields.jfield import FQ, FR, PASTA_FP, PASTA_FQ, Field
from sirius_tpu.fields.limb import int_to_limbs, limbs_to_int

ALL_FIELDS = [FQ, FR, PASTA_FP, PASTA_FQ]


def rand_ints(rng, f: Field, n: int):
    return [int(x) % f.p for x in rng.integers(0, 2**63, size=(n, 5)).astype(object).dot([1, 2**63, 2**126, 2**189, 2**252])]


@pytest.mark.parametrize("f", ALL_FIELDS, ids=lambda f: f.spec.name)
def test_limb_roundtrip(f, rng):
    xs = rand_ints(rng, f, 8)
    for x in xs:
        assert limbs_to_int(int_to_limbs(x)) == x


@pytest.mark.parametrize("f", ALL_FIELDS, ids=lambda f: f.spec.name)
def test_encode_decode(f, rng):
    xs = rand_ints(rng, f, 16)
    assert f.decode(f.encode(xs)) == xs


@pytest.mark.parametrize("f", ALL_FIELDS, ids=lambda f: f.spec.name)
def test_add_sub_neg(f, rng):
    xs = rand_ints(rng, f, 32)
    ys = rand_ints(rng, f, 32)
    # include edge values
    xs[:4] = [0, 1, f.p - 1, f.p - 1]
    ys[:4] = [0, f.p - 1, f.p - 1, 1]
    a, b = f.encode(xs), f.encode(ys)
    assert f.decode(f.add(a, b)) == [(x + y) % f.p for x, y in zip(xs, ys)]
    assert f.decode(f.sub(a, b)) == [(x - y) % f.p for x, y in zip(xs, ys)]
    assert f.decode(f.neg(a)) == [(-x) % f.p for x in xs]


@pytest.mark.parametrize("f", ALL_FIELDS, ids=lambda f: f.spec.name)
def test_mul(f, rng):
    xs = rand_ints(rng, f, 32)
    ys = rand_ints(rng, f, 32)
    xs[:3] = [0, 1, f.p - 1]
    ys[:3] = [f.p - 1, f.p - 1, f.p - 1]
    a, b = f.encode(xs), f.encode(ys)
    assert f.decode(f.mul(a, b)) == [(x * y) % f.p for x, y in zip(xs, ys)]
    assert f.decode(f.square(a)) == [(x * x) % f.p for x in xs]


@pytest.mark.parametrize("f", [FR, PASTA_FP], ids=lambda f: f.spec.name)
def test_pow_inv(f, rng):
    xs = rand_ints(rng, f, 8)
    a = f.encode(xs)
    assert f.decode(f.pow_int(a, 5)) == [pow(x, 5, f.p) for x in xs]
    inv = f.inv(a)
    assert f.decode(inv) == [pow(x, -1, f.p) if x else 0 for x in xs]


@pytest.mark.parametrize("f", [FR], ids=lambda f: f.spec.name)
def test_batch_inv(f, rng):
    xs = rand_ints(rng, f, 33)
    xs[5] = 0
    xs[17] = 0
    a = f.encode(xs)
    got = f.decode(f.batch_inv(a))
    want = gold.batch_inv(xs, f.p)
    assert got == want


@pytest.mark.parametrize("f", [FR], ids=lambda f: f.spec.name)
def test_sum_reduce(f, rng):
    xs = rand_ints(rng, f, 37)
    a = f.encode(xs)
    assert f.decode_one(f.sum_reduce(a)) == sum(xs) % f.p


def test_field_constants_sane():
    for spec in (bn256_fq, bn256_fr, pasta_fp, pasta_fq):
        p = spec.modulus
        # primality (Miller-Rabin via sympy-free check: small Fermat bases)
        for base in (2, 3, 5, 7, 11):
            assert pow(base, p - 1, p) == 1, spec.name
        # 2-adicity
        assert (p - 1) % (1 << spec.two_adicity) == 0
        assert (p - 1) % (1 << (spec.two_adicity + 1)) != 0
        # root of unity has exact order 2^s
        w = spec.root_of_unity
        assert pow(w, 1 << spec.two_adicity, p) == 1
        assert pow(w, 1 << (spec.two_adicity - 1), p) != 1
