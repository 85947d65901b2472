"""Frozen accumulator golden digests (the re-scoped bit-exactness criterion,
PARITY.md "Bit-exactness scope"): folding the fixed fixture configs below
must reproduce these digests on every commit.  Any unintended change to the
transcript absorb order, Poseidon constants, fold arithmetic, witness
layout, or commitment pipeline fails here.

To refresh intentionally (a PROTOCOL change): run with
SIRIUS_TPU_PRINT_GOLDEN=1 and update the constants, recording the reason in
PARITY.md.
"""

import os

import pytest

from sirius_tpu.curves.jpoint import BN256_G1
from sirius_tpu.fields import gold
from sirius_tpu.fields.constants import bn256_fq, bn256_fr, bn256_g1
from sirius_tpu.frontend.runner import CircuitRunner
from sirius_tpu.nifs.protogalaxy import AccumulatorInstance, ProtoGalaxy
from sirius_tpu.nifs.sangria import (
    RelaxedPlonkInstance,
    RelaxedPlonkTrace,
    RelaxedPlonkWitness,
    VanillaFS,
)
from sirius_tpu.ops.commitment import CommitmentKey
from sirius_tpu.ops.poseidon import PoseidonHash, poseidon_spec
from sirius_tpu.plonk.sps import run_sps_protocol
from sirius_tpu.util.golden import pg_acc_digest, sangria_acc_digest

from fixtures import FiboCircuit

K = 4

SANGRIA_FIBO_2FOLD_DIGEST = "1a5a2de2b2308bd72dd55cf500e631d5915d1be12874c39139aebd1614526541"
PG_FIBO_1FOLD_DIGEST = "ac15a68e6cc6cf7f3afe286e52291414977a854bcd2b1144baa88e3a2ef24df9"


def _maybe_check(name: str, frozen: str, got: str):
    if os.environ.get("SIRIUS_TPU_PRINT_GOLDEN"):
        print(f"\n{name} = \"{got}\"")
        return
    assert got == frozen, (
        f"{name} drifted: {got} != frozen {frozen}. If the protocol change is "
        "intentional, refresh via SIRIUS_TPU_PRINT_GOLDEN=1 and record it in PARITY.md."
    )


def _ro():
    return PoseidonHash(poseidon_spec(bn256_fq, 3, 2, 4, 3))


def _pg_ro():
    return PoseidonHash(poseidon_spec(bn256_fr, 3, 2, 4, 3))


@pytest.fixture(scope="module")
def ck():
    return CommitmentKey.setup(BN256_G1, 7, b"sangria-test", use_cache=True, window_bits=4)


def test_sangria_fibo_two_fold_golden(ck):
    p = bn256_fr.modulus
    c1, c2 = FiboCircuit(1, 1, 10), FiboCircuit(2, 3, 10)
    inst1, inst2 = c1.instances(p), c2.instances(p)
    r1 = CircuitRunner(K, bn256_fr, c1, inst1)
    S = r1.collect_plonk_structure()
    W1 = r1.collect_witness()
    W2 = CircuitRunner(K, bn256_fr, c2, inst2).collect_witness()
    ro = _ro()
    tr1 = run_sps_protocol(S, ck, inst1, W1, ro)
    tr2 = run_sps_protocol(S, ck, inst2, W2, ro)

    pp, _ = VanillaFS.setup_params(gold.identity(bn256_g1), S)
    f = S.field
    acc = RelaxedPlonkTrace(
        U=RelaxedPlonkInstance.new(bn256_g1, S.num_challenges, len(S.round_sizes), len(S.num_io) - 1),
        W=RelaxedPlonkWitness([f.zeros((sz,)) for sz in S.round_sizes], f.zeros((S.n,))),
    )
    ro_acc = _ro()
    acc, _ = VanillaFS.prove(ck, pp, ro_acc, acc, tr1)
    acc, _ = VanillaFS.prove(ck, pp, ro_acc, acc, tr2)
    _maybe_check("SANGRIA_FIBO_2FOLD_DIGEST", SANGRIA_FIBO_2FOLD_DIGEST, sangria_acc_digest(acc.U))


def test_protogalaxy_fibo_fold_golden(ck):
    p = bn256_fr.modulus
    c1, c2 = FiboCircuit(1, 1, 10), FiboCircuit(2, 3, 10)
    inst1, inst2 = c1.instances(p), c2.instances(p)
    r1 = CircuitRunner(K, bn256_fr, c1, inst1)
    S = r1.collect_plonk_structure()
    W1 = r1.collect_witness()
    W2 = CircuitRunner(K, bn256_fr, c2, inst2).collect_witness()
    tr1 = run_sps_protocol(S, ck, inst1, W1, _pg_ro())
    tr2 = run_sps_protocol(S, ck, inst2, W2, _pg_ro())

    pp, _vp = ProtoGalaxy.setup_params(gold.identity(bn256_g1), S)
    acc = ProtoGalaxy.new_accumulator(pp, _pg_ro(), tr1, bn256_g1)
    new_acc, _proof = ProtoGalaxy.prove(ck, pp, _pg_ro(), acc, [tr2])
    _maybe_check(
        "PG_FIBO_1FOLD_DIGEST", PG_FIBO_1FOLD_DIGEST,
        pg_acc_digest(AccumulatorInstance.from_acc(new_acc)),
    )
