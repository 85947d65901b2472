"""End-to-end Sangria NIFS round-trip (analogue of reference
`nifs/sangria/tests.rs:57-345`): synthesize fixtures with our frontend, run
SPS, check is_sat, fold two traces, assert prover/verifier accumulator
equality and relaxed is_sat at every step."""

import pytest

from sirius_tpu.fields import gold
from sirius_tpu.fields.constants import bn256_fq, bn256_fr, bn256_g1
from sirius_tpu.frontend.runner import CircuitRunner
from sirius_tpu.nifs.sangria import (
    RelaxedPlonkInstance,
    RelaxedPlonkTrace,
    RelaxedPlonkWitness,
    VanillaFS,
)
from sirius_tpu.ops.commitment import CommitmentKey
from sirius_tpu.ops.poseidon import PoseidonHash, poseidon_spec
from sirius_tpu.curves.jpoint import BN256_G1
from sirius_tpu.plonk import satisfy
from sirius_tpu.plonk.sps import run_sps_protocol

from fixtures import FiboCircuit, SquareCircuit

K = 4


def create_ro():
    """Test RO matching reference tests: T=3 RATE=2 R_F=4 R_P=3 over C::Base."""
    return PoseidonHash(poseidon_spec(bn256_fq, 3, 2, 4, 3))


@pytest.fixture(scope="module")
def ck():
    # key for up to 2^7 scalars; tiny windows compile fastest on CPU
    key = CommitmentKey.setup(BN256_G1, 7, b"sangria-test", use_cache=True, window_bits=4)
    return key


def prepare(circuit_cls, params1, params2, ck):
    p = bn256_fr.modulus
    c1 = circuit_cls(*params1)
    c2 = circuit_cls(*params2)
    inst1, inst2 = c1.instances(p), c2.instances(p)

    r1 = CircuitRunner(K, bn256_fr, c1, inst1)
    S = r1.collect_plonk_structure()
    W1 = r1.collect_witness()
    r2 = CircuitRunner(K, bn256_fr, c2, inst2)
    W2 = r2.collect_witness()

    ro = create_ro()
    tr1 = run_sps_protocol(S, ck, inst1, W1, ro)
    tr2 = run_sps_protocol(S, ck, inst2, W2, ro)
    return S, tr1, tr2


def fold_and_check(S, tr1, tr2, ck):
    curve = bn256_g1
    pp, vp = VanillaFS.setup_params(gold.identity(curve), S)
    f = S.field

    acc = RelaxedPlonkTrace(
        U=RelaxedPlonkInstance.new(
            curve, S.num_challenges, len(S.round_sizes), len(S.num_io) - 1
        ),
        W=RelaxedPlonkWitness(
            [f.zeros((sz,)) for sz in S.round_sizes], f.zeros((S.n,))
        ),
    )
    all_instances = [tr1.u.instances, tr2.u.instances]

    ro_nark_v, ro_acc_p, ro_acc_v = create_ro(), create_ro(), create_ro()

    for step, tr in enumerate([tr1, tr2]):
        new_acc, ct_commits = VanillaFS.prove(ck, pp, ro_acc_p, acc, tr)
        U_verify = VanillaFS.verify(
            vp, curve, ro_nark_v, ro_acc_v, acc.U, tr.u, ct_commits
        )
        assert U_verify == new_acc.U, f"prove/verify mismatch at step {step}"
        acc = new_acc
        errors = VanillaFS.is_sat(ck, S, acc, all_instances[: step + 1])
        assert not errors, f"step {step}: {errors}"


def test_square_zero_round(ck):
    """Single gate, no lookup -> 0-challenge SPS."""
    S, tr1, tr2 = prepare(SquareCircuit, (3,), (5,), ck)
    assert S.num_challenges == 0
    ro = create_ro()
    satisfy.is_sat(S, ck, ro, tr1.u, tr1.w)
    satisfy.is_sat_perm(S, tr1.u, tr1.w)
    fold_and_check(S, tr1, tr2, ck)


def test_fibo_one_round(ck):
    """Two gates, no lookup -> 1-challenge SPS."""
    S, tr1, tr2 = prepare(FiboCircuit, (1, 1, 10), (2, 3, 10), ck)
    assert S.num_challenges == 1
    ro = create_ro()
    satisfy.is_sat(S, ck, ro, tr1.u, tr1.w)
    fold_and_check(S, tr1, tr2, ck)


def test_is_sat_catches_corruption(ck):
    S, tr1, _ = prepare(SquareCircuit, (3,), (5,), ck)
    f = S.field
    bad = tr1.w.W[0].at[3].set(f.encode([999])[0])
    tr1.w.W[0] = bad
    ro = create_ro()
    with pytest.raises(satisfy.IsSatError):
        satisfy.is_sat(S, ck, ro, tr1.u, tr1.w)


def test_vandermonde_inverse_identity():
    """V^-1 rows recover polynomial coefficients from evaluations at 0..D
    (the basis of the interpolated cross-term path)."""
    from sirius_tpu.nifs.sangria import _vandermonde_inv

    p = bn256_fr.modulus
    for D in (1, 2, 5, 9):
        rows = _vandermonde_inv(p, D)
        import random

        rnd = random.Random(D)
        coeffs = [rnd.randrange(p) for _ in range(D + 1)]
        evals = [sum(c * pow(x, k, p) for k, c in enumerate(coeffs)) % p for x in range(D + 1)]
        got = [sum(rows[k][j] * evals[j] for j in range(D + 1)) % p for k in range(D + 1)]
        assert got == coeffs
