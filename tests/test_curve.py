"""EC point kernels + MSM vs gold model."""

import numpy as np
import os

import pytest

SLOW_GATED = not os.environ.get("SIRIUS_TPU_SLOW_TESTS")

from sirius_tpu.curves.jpoint import BN256_G1, GRUMPKIN, Points
from sirius_tpu.fields import gold
from sirius_tpu.fields.limb import ints_to_limbs
from sirius_tpu.ops.msm import msm_jitted, msm_naive

import jax.numpy as jnp


def rand_points(curve, rng, n):
    g = gold.generator(curve.spec)
    return [g.mul(int(k)) for k in rng.integers(1, 2**62, size=n)]


@pytest.mark.parametrize("curve", [BN256_G1, GRUMPKIN], ids=lambda c: c.spec.name)
def test_add_dbl_vs_gold(curve, rng):
    pts = rand_points(curve, rng, 6)
    qts = rand_points(curve, rng, 6)
    # exercise exceptional cases: identity operands, P+P, P+(-P)
    pts[0] = gold.identity(curve.spec)
    qts[1] = gold.identity(curve.spec)
    qts[2] = pts[2]
    qts[3] = pts[3].neg()

    P, Q = curve.encode(pts), curve.encode(qts)
    got_add = curve.decode(curve.add(P, Q))
    got_dbl = curve.decode(curve.dbl(P))
    for i in range(6):
        assert got_add[i] == pts[i].add(qts[i]), f"add lane {i}"
        assert got_dbl[i] == pts[i].double(), f"dbl lane {i}"


def test_scalar_mul_vs_gold(rng):
    curve = BN256_G1
    pts = rand_points(curve, rng, 2)
    k = 0xDEADBEEFCAFE1234567890
    bits = jnp.asarray(
        np.array([(k >> i) & 1 for i in range(254)], dtype=np.uint32)
    )
    got = curve.decode(curve.scalar_mul(curve.encode(pts), bits))
    for i in range(2):
        assert got[i] == pts[i].mul(k)


def test_sum_reduce_points(rng):
    curve = BN256_G1
    pts = rand_points(curve, rng, 9)
    got = curve.decode_point(curve.sum_reduce(curve.encode(pts))) if hasattr(curve, "decode_point") else curve.decode(
        Points(*(c[None] for c in curve.sum_reduce(curve.encode(pts))))
    )[0]
    want = gold.identity(curve.spec)
    for p in pts:
        want = want.add(p)
    assert got == want


@pytest.mark.parametrize("n", [7])
def test_msm_naive_vs_gold(n, rng):
    curve = BN256_G1
    pts = rand_points(curve, rng, n)
    scalars = [int(x) for x in rng.integers(0, 2**63, size=n)]
    scalars[0] = 0
    arr = jnp.asarray(ints_to_limbs(scalars))
    got = curve.decode(Points(*(c[None] for c in msm_naive(curve, arr, curve.encode(pts)))))[0]
    assert got == gold.msm(scalars, pts)


@pytest.mark.parametrize("n,c", [(33, 8)])
def test_msm_pippenger_vs_gold(n, c, rng):
    curve = BN256_G1
    pts = rand_points(curve, rng, n)
    # full-width scalars to exercise every window
    scalars = [int(a) | (int(b) << 63) | (int(cc) << 126) | (int(d) << 189) for a, b, cc, d in rng.integers(0, 2**63, size=(n, 4))]
    scalars = [s % curve.fs.p for s in scalars]
    scalars[1] = 0
    scalars[2] = 1
    arr = jnp.asarray(ints_to_limbs(scalars))
    got = curve.decode(Points(*(cc[None] for cc in msm_jitted(curve, arr, curve.encode(pts), window_bits=c))))[0]
    assert got == gold.msm(scalars, pts)


@pytest.mark.parametrize(
    "n,c,G",
    [
        pytest.param(48, 4, 8, marks=pytest.mark.skipif(SLOW_GATED, reason="window-size variant gated (suite budget)")),
        (40, 8, 8),
    ],
)
def test_msm_bucket_vs_gold(n, c, G, rng):
    """One-hot (c<=5) and scatter (c>5) bucket-table kernels vs gold."""
    from sirius_tpu.ops.msm import msm_bucket

    curve = BN256_G1
    pts = rand_points(curve, rng, n)
    scalars = [
        int(a) | (int(b) << 63) | (int(cc) << 126) | (int(d) << 189)
        for a, b, cc, d in rng.integers(0, 2**63, size=(n, 4))
    ]
    scalars = [s % curve.fs.p for s in scalars]
    scalars[1] = 0
    scalars[2] = 1
    arr = jnp.asarray(ints_to_limbs(scalars))
    got = msm_bucket(curve, arr, curve.encode(pts), window_bits=c, group_count=G)
    assert got == gold.msm(scalars, pts)


def test_msm_sharded_vs_gold(rng):
    """Bucket MSM sharded over the virtual 8-device mesh (shard_map)."""
    from sirius_tpu.ops.msm import msm_sharded
    from sirius_tpu.parallel.mesh import make_mesh

    curve = BN256_G1
    n = 96  # non-divisible -> exercises padding
    pts = rand_points(curve, rng, n)
    scalars = [
        int(a) | (int(b) << 63) | (int(cc) << 126) | (int(d) << 189)
        for a, b, cc, d in rng.integers(0, 2**63, size=(n, 4))
    ]
    scalars = [s % curve.fs.p for s in scalars]
    scalars[0] = 0
    arr = jnp.asarray(ints_to_limbs(scalars))
    mesh = make_mesh(8)
    got = msm_sharded(curve, arr, curve.encode(pts), mesh, window_bits=4, group_count=8)
    assert got == gold.msm(scalars, pts)


def test_msm_bucket_fused_vs_gold(rng):
    """Fully-fused single-program MSM (digits + totals + device Horner)."""
    from sirius_tpu.ops.msm import msm_bucket_fused

    curve = BN256_G1
    n = 48
    pts = rand_points(curve, rng, n)
    scalars = [
        (int(a) | (int(b) << 63) | (int(cc) << 126) | (int(d) << 189)) % curve.fs.p
        for a, b, cc, d in rng.integers(0, 2**63, size=(n, 4))
    ]
    scalars[0] = 0
    scalars[1] = 1
    arr = jnp.asarray(ints_to_limbs(scalars))
    got = msm_bucket_fused(curve, arr, curve.encode(pts), window_bits=4, group_count=16)
    assert got == gold.msm(scalars, pts)


@pytest.mark.parametrize(
    "c",
    [
        4,
        pytest.param(5, marks=pytest.mark.skipif(SLOW_GATED, reason="c=5 signed-digit variant gated (c5_cross_limb keeps c=5 coverage)")),
    ],
)
def test_msm_bucket_signed_digits(c, rng):
    """Signed-digit windows (B = 2^(c-1) buckets, negated-point adds,
    carry chain incl. the extra top window) vs gold."""
    from sirius_tpu.ops.msm import msm_bucket

    curve = BN256_G1
    n = 48
    pts = rand_points(curve, rng, n)
    scalars = [
        (int(a) | (int(b) << 63) | (int(cc) << 126) | (int(d) << 189)) % curve.fs.p
        for a, b, cc, d in rng.integers(0, 2**63, size=(n, 4))
    ]
    # edge scalars: zero, one, p-1 (max carries), all-high-digit value
    scalars[0] = 0
    scalars[1] = 1
    scalars[2] = curve.fs.p - 1
    scalars[3] = int("f" * 63, 16) % curve.fs.p
    arr = jnp.asarray(ints_to_limbs(scalars))
    got = msm_bucket(curve, arr, curve.encode(pts), window_bits=c, group_count=16,
                     signed_digits=True)
    assert got == gold.msm(scalars, pts)


def test_msm_bucket_c5_cross_limb(rng):
    """c=5 windows straddle 16-bit limb boundaries (general extraction)."""
    from sirius_tpu.ops.msm import msm_bucket

    curve = BN256_G1
    n = 48
    pts = rand_points(curve, rng, n)
    scalars = [
        (int(a) | (int(b) << 63) | (int(cc) << 126) | (int(d) << 189)) % curve.fs.p
        for a, b, cc, d in rng.integers(0, 2**63, size=(n, 4))
    ]
    arr = jnp.asarray(ints_to_limbs(scalars))
    got = msm_bucket(curve, arr, curve.encode(pts), window_bits=5, group_count=16,
                     assume_distinct=True)
    assert got == gold.msm(scalars, pts)
