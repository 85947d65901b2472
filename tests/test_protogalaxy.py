"""ProtoGalaxy NIFS round-trip (analogue of reference
`nifs/protogalaxy/tests.rs` Mock harness): fold L traces, check
evaluate_e == acc.e, prover/verifier consistency, is_sat trio."""

import os

import pytest

SLOW_GATED = not os.environ.get("SIRIUS_TPU_SLOW_TESTS")

from sirius_tpu.fields import gold
from sirius_tpu.fields.constants import bn256_fr, bn256_g1
from sirius_tpu.frontend.runner import CircuitRunner
from sirius_tpu.nifs.protogalaxy import (
    Accumulator,
    AccumulatorInstance,
    ProtoGalaxy,
    evaluate_e_from_trace,
)
from sirius_tpu.ops.commitment import CommitmentKey
from sirius_tpu.ops.poseidon import PoseidonHash, poseidon_spec
from sirius_tpu.curves.jpoint import BN256_G1
from sirius_tpu.plonk.sps import run_sps_protocol

from fixtures import FiboCircuit, FiboXorLookupCircuit, SquareCircuit

K = 4


def create_ro():
    # PG transcript runs over the scalar field (native, no ECC)
    return PoseidonHash(poseidon_spec(bn256_fr, 3, 2, 4, 3))


@pytest.fixture(scope="module")
def ck():
    return CommitmentKey.setup(BN256_G1, 7, b"pg-test", use_cache=True, window_bits=4)


def make_traces(circuit_cls, params_list, ck):
    p = bn256_fr.modulus
    circuits = [circuit_cls(*ps) for ps in params_list]
    insts = [c.instances(p) for c in circuits]
    runner0 = CircuitRunner(K, bn256_fr, circuits[0], insts[0])
    S = runner0.collect_plonk_structure()
    traces = []
    ro = create_ro()
    for c, inst in zip(circuits, insts):
        W = CircuitRunner(K, bn256_fr, c, inst).collect_witness()
        traces.append(run_sps_protocol(S, ck, inst, W, ro))
    return S, traces


def run_mock(circuit_cls, params_list, ck):
    """Mirror of the reference Mock harness (`protogalaxy/tests.rs:77-265`):
    generate all L traces on one shared transcript, seed the accumulator
    from traces[0] with a fresh RO, fold ALL L traces, verify with fresh
    ROs, compare accumulators, run the is_sat trio."""
    S, traces = make_traces(circuit_cls, params_list, ck)
    pp, vp = ProtoGalaxy.setup_params(gold.identity(bn256_g1), S)

    acc = ProtoGalaxy.new_accumulator(pp, create_ro(), traces[0], bn256_g1)
    assert evaluate_e_from_trace(S, acc.trace, acc.betas) == acc.e
    ProtoGalaxy.is_sat_accumulation(S, acc)
    ProtoGalaxy.is_sat_permutation(S, acc)

    new_acc, proof = ProtoGalaxy.prove(ck, pp, create_ro(), acc, traces)
    errors = ProtoGalaxy.is_sat(ck, S, new_acc)
    assert not errors, errors

    ver_ins = ProtoGalaxy.verify(
        vp, bn256_fr, create_ro(), create_ro(),
        AccumulatorInstance.from_acc(acc), [t.u for t in traces], proof,
    )
    assert ver_ins.betas == new_acc.betas
    assert ver_ins.e == new_acc.e % bn256_fr.modulus
    assert ver_ins.ins.instances == new_acc.trace.u.instances
    assert ver_ins.ins.challenges == new_acc.trace.u.challenges
    assert ver_ins.ins.W_commitments == new_acc.trace.u.W_commitments


@pytest.mark.skipif(SLOW_GATED, reason="fibo_lookup_L1 covers the PG pipeline incl. lookups; gate-only variants gated (suite budget, round-5)")
def test_protogalaxy_square_L1(ck):
    run_mock(SquareCircuit, [(3,)], ck)


@pytest.mark.skipif(SLOW_GATED, reason="fibo_lookup_L1 covers the PG pipeline incl. lookups; gate-only variants gated (suite budget, round-5)")
def test_protogalaxy_fibo_L1(ck):
    run_mock(FiboCircuit, [(1, 1, 10)], ck)


@pytest.mark.skipif(SLOW_GATED, reason="L1 covers the path; L3 multi-instance tier gated (suite budget)")
def test_protogalaxy_fibo_L3(ck):
    run_mock(FiboCircuit, [(1, 1, 10), (2, 3, 10), (3, 5, 10)], ck)


def test_protogalaxy_fibo_lookup_L1(ck):
    """Reference `nifs/protogalaxy/tests.rs` fibo-lookup analogue: PG fold
    of a 3-round-SPS vector-lookup trace (challenges + lookup vars in F/G)."""
    run_mock(FiboXorLookupCircuit, [(1, 2, 8)], ck)


@pytest.mark.skipif(SLOW_GATED, reason="L1 covers the path; L3 multi-instance tier gated (suite budget)")
def test_protogalaxy_fibo_lookup_L3(ck):
    run_mock(FiboXorLookupCircuit, [(1, 2, 8), (3, 1, 8), (2, 3, 8)], ck)
