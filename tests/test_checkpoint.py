"""Checkpoint / resume (SURVEY.md §5: the reference only caches commitment
keys; accumulator checkpointing is the new-framework addition).  Fast path:
Sangria NIFS fold -> save -> load -> fold again -> is_sat.  The IVC-level
cyclefold round-trip lives in test_cyclefold.py (slow suite)."""

import os

import pytest

from sirius_tpu.curves.jpoint import BN256_G1
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
from sirius_tpu.plonk.sps import run_sps_protocol
from sirius_tpu.util.checkpoint import (
    load_sangria_accumulator,
    save_sangria_accumulator,
)

from fixtures import SquareCircuit

K = 4


def create_ro():
    return PoseidonHash(poseidon_spec(bn256_fq, 3, 2, 4, 3))


def test_sangria_accumulator_checkpoint_roundtrip(tmp_path):
    ck = CommitmentKey.setup(BN256_G1, 7, b"sangria-test", use_cache=True, window_bits=4)
    p = bn256_fr.modulus
    c1, c2 = SquareCircuit(3), SquareCircuit(5)
    inst1, inst2 = c1.instances(p), c2.instances(p)
    r1 = CircuitRunner(K, bn256_fr, c1, inst1)
    S = r1.collect_plonk_structure()
    W1 = r1.collect_witness()
    W2 = CircuitRunner(K, bn256_fr, c2, inst2).collect_witness()
    ro = create_ro()
    tr1 = run_sps_protocol(S, ck, inst1, W1, ro)
    tr2 = run_sps_protocol(S, ck, inst2, W2, ro)

    pp, _vp = VanillaFS.setup_params(gold.identity(bn256_g1), S)
    f = S.field
    acc = RelaxedPlonkTrace(
        U=RelaxedPlonkInstance.new(bn256_g1, S.num_challenges, len(S.round_sizes), len(S.num_io) - 1),
        W=RelaxedPlonkWitness([f.zeros((sz,)) for sz in S.round_sizes], f.zeros((S.n,))),
    )
    ro_p = create_ro()
    acc, _ = VanillaFS.prove(ck, pp, ro_p, acc, tr1)

    path = str(tmp_path / "ckpt")
    save_sangria_accumulator(path, bn256_g1, acc, "digest-1", step=1)

    # digest mismatch must refuse
    with pytest.raises(ValueError):
        load_sangria_accumulator(path, "digest-2")

    loaded, step = load_sangria_accumulator(path, "digest-1")
    assert step == 1
    assert loaded.U == acc.U

    # fold the second trace on the RESUMED accumulator and check satisfaction
    acc2, _ = VanillaFS.prove(ck, pp, ro_p, loaded, tr2)
    errors = VanillaFS.is_sat(ck, S, acc2, [tr1.u.instances, tr2.u.instances])
    assert not errors, errors
