"""Device-batched SVDW vs the host map (reference `commitment.rs:55-79`
derives generators by hash-to-curve; our device path must be bit-identical
to the host path so key caches and digests agree regardless of where the
key was built).

Covers both sqrt regimes: bn256 Fq (p = 3 mod 4, direct pow) and grumpkin's
base field = bn256 Fr (p = 1 mod 4, 2-adicity 28, constant-iteration
Tonelli–Shanks)."""

import hashlib

import pytest

from sirius_tpu.curves.hash_to_curve import (
    _sqrt_device,
    _tonelli,
    hash_bytes_to_point,
    hash_bytes_to_points_device,
)
from sirius_tpu.curves.jpoint import BN256_G1, GRUMPKIN


@pytest.mark.parametrize("curve", [BN256_G1, GRUMPKIN], ids=lambda c: c.spec.name)
def test_device_matches_host(curve):
    n = 16
    stream = hashlib.shake_256(b"h2c-" + curve.spec.name.encode()).digest(64 * n)
    dec = curve.decode(hash_bytes_to_points_device(curve, stream))
    for i in range(n):
        want = hash_bytes_to_point(curve.spec, stream[i * 64 : (i + 1) * 64])
        assert dec[i] == want, i


def test_tonelli_shanks_device_roots():
    """Constant-iteration TS on the p = 1 (mod 4) field: y^2 == a exactly for
    quadratic residues, and the y^2 != a outcome flags non-residues."""
    f = GRUMPKIN.fb
    p = f.p
    sq = [pow(x, 2, p) for x in range(2, 10)]
    nonsq = [a for a in range(2, 40) if pow(a, (p - 1) // 2, p) != 1][:4]
    vals = sq + nonsq + [0]
    a = f.encode(vals)  # Montgomery form
    y = _sqrt_device(f, a)
    got = f.decode(f.mul(y, y))
    for v, yy in zip(vals, got):
        if v == 0 or pow(v, (p - 1) // 2, p) == 1:
            assert yy == v  # true sqrt, matching host _tonelli up to sign
            if v:
                r = _tonelli(v, p)
                assert yy == r * r % p
        else:
            assert yy != v  # non-residue detected by the y^2 check
