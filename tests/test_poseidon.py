"""Poseidon: Grain constants, sponge semantics, golden vector, device parity.

Golden vector from reference `src/poseidon/poseidon_hash.rs:247-265`:
PoseidonHash over pasta Fp with T=3 RATE=2 Spec(R_F=4, R_P=3), absorbing
field elements 0..4 and squeezing 128 bits must equal
277726250230731218669330566268314254439.
"""

import numpy as np
import pytest

from sirius_tpu.fields.constants import bn256_fr, pasta_fp
from sirius_tpu.ops.poseidon import (
    DevicePoseidon,
    Grain,
    PoseidonHash,
    permute,
    poseidon_spec,
)

GOLDEN = 277726250230731218669330566268314254439


def test_poseidon_golden_vector():
    spec = poseidon_spec(pasta_fp, 3, 2, 4, 3)
    out = PoseidonHash(spec).absorb_iter(range(5)).squeeze(128)
    assert out == GOLDEN


def test_sponge_padding_exact_multiple():
    """Absorbing an exact multiple of RATE appends an empty padded permutation."""
    spec = poseidon_spec(pasta_fp, 3, 2, 4, 3)
    h4 = PoseidonHash(spec).absorb_iter(range(4)).squeeze(128)
    h5 = PoseidonHash(spec).absorb_iter(range(5)).squeeze(128)
    assert h4 != h5
    # manual: exact multiple -> chunks then empty permutation
    state = spec.initial_state
    state = permute(spec, state, [0, 1])
    state = permute(spec, state, [2, 3])
    state = permute(spec, state, [])
    assert state[1] & ((1 << 128) - 1) == h4


def test_buffer_persists_after_squeeze():
    """Reference `output` clones the buffer and does not clear it."""
    spec = poseidon_spec(pasta_fp, 3, 2, 4, 3)
    ro = PoseidonHash(spec).absorb_iter([7, 8])
    first = ro.squeeze(128)
    ro.absorb_field(9)
    second = ro.squeeze(128)
    fresh = PoseidonHash(spec).absorb_iter([7, 8, 9]).squeeze(128)
    assert second == fresh
    assert first != second


def test_grain_determinism_and_rejection():
    g1 = Grain(bn256_fr, 5, 10, 10)
    g2 = Grain(bn256_fr, 5, 10, 10)
    a = [g1.next_field_element() for _ in range(4)]
    b = [g2.next_field_element() for _ in range(4)]
    assert a == b
    assert all(0 <= x < bn256_fr.modulus for x in a)
    # different params -> different stream
    g3 = Grain(bn256_fr, 5, 10, 11)
    assert [g3.next_field_element() for _ in range(4)] != a


def test_sirius_default_spec_builds():
    """The reference's RO spec: T=5, RATE=4, R_F=10, R_P=10 over bn256
    (`src/lib.rs:89-106`)."""
    spec = poseidon_spec(bn256_fr, 5, 4, 10, 10)
    assert len(spec.round_constants) == 20
    assert len(spec.mds) == 5
    out = PoseidonHash(spec).absorb_iter(range(3)).squeeze(128)
    assert 0 < out < 1 << 128


def test_device_permutation_matches_host():
    spec = poseidon_spec(bn256_fr, 5, 4, 10, 10)
    dev = DevicePoseidon(spec)
    f = dev.f
    batch = 3
    rng = np.random.default_rng(1)
    inputs = [[int(rng.integers(0, 2**61)) for _ in range(4)] for _ in range(batch)]

    state = dev.initial_state(batch)
    inp = f.encode([v for row in inputs for v in row]).reshape(batch, 4, -1)
    out = dev.permute(state, inp)

    for bi in range(batch):
        host = permute(spec, spec.initial_state, inputs[bi])
        got = f.decode(out[bi])
        assert got == host


def test_optimized_schedule_matches_plain():
    """The PSE optimized schedule (pre_sparse_mds + sparse partial rounds,
    reference poseidon_hash.rs:205-237) is bit-identical to the plain
    ARC->sbox->MDS sequence for every input width, including at the
    production parameterizations."""
    import random

    from sirius_tpu.fields.constants import pasta_fp
    from sirius_tpu.ops.poseidon import optimized_spec, permute_optimized

    for (fld, t, rate, rf, rp) in [
        (pasta_fp, 3, 2, 4, 3),
        (bn256_fr, 5, 4, 10, 10),
        (bn256_fr, 3, 2, 8, 57),
    ]:
        spec = poseidon_spec(fld, t, rate, rf, rp)
        opt = optimized_spec(spec)
        assert len(opt.start) == rf // 2 + 1
        assert len(opt.partial) == rp
        assert len(opt.end) == rf // 2 - 1
        rng = random.Random(7)
        for _ in range(3):
            state = [rng.randrange(fld.modulus) for _ in range(t)]
            for ninp in range(rate + 1):
                inputs = [rng.randrange(fld.modulus) for _ in range(ninp)]
                assert permute(spec, state, inputs) == permute_optimized(
                    spec, state, inputs
                ), (t, rf, rp, ninp)
