"""Lookup arguments: 2- and 3-round SPS protocols + folding with lookups
(analogue of reference `fibo_circuit_with_lookup` tests)."""

import os

import pytest

SLOW_GATED = not os.environ.get("SIRIUS_TPU_SLOW_TESTS")

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

K = 5
TABLE = 16


def create_ro():
    return PoseidonHash(poseidon_spec(bn256_fq, 3, 2, 4, 3))


@pytest.fixture(scope="module")
def ck():
    return CommitmentKey.setup(BN256_G1, 9, b"lookup-test", use_cache=True, window_bits=4)


class RangeCircuit:
    """Single (scalar) lookup: every a-value must be in the fixed table
    {0..TABLE-1} -> 2-round SPS."""

    def __init__(self, values):
        self.values = values

    def configure(self, cs):
        a = cs.advice_column()
        t = cs.fixed_column()
        inst = cs.instance_column()
        cs.lookup([cs.query(a)], [cs.query(t)])
        # one trivial gate so gates list is non-empty even without lookups
        s = cs.selector()
        cs.create_gate("noop", [cs.query(s) * (cs.query(a) - cs.query(a))])
        return (a, t, inst)

    def synthesize(self, config, asn):
        a, t, inst = config
        for row in range(1 << K):
            asn.assign_fixed(t, row, row % TABLE)
        for row, v in enumerate(self.values):
            asn.assign_advice(a, row, v)
        asn.copy(a, 0, inst, 0)

    def instances(self):
        return [[self.values[0], 0]]


class VectorRangeCircuit:
    """Vector lookup: pairs (a, b) must appear in the fixed table of pairs
    (i, i^2 mod TABLE) -> 3-round SPS."""

    def __init__(self, values):
        self.values = values  # list of i's

    def configure(self, cs):
        a = cs.advice_column()
        b = cs.advice_column()
        t1 = cs.fixed_column()
        t2 = cs.fixed_column()
        inst = cs.instance_column()
        cs.lookup([cs.query(a), cs.query(b)], [cs.query(t1), cs.query(t2)])
        s = cs.selector()
        cs.create_gate("noop", [cs.query(s) * (cs.query(a) - cs.query(a))])
        return (a, b, t1, t2, inst)

    def synthesize(self, config, asn):
        a, b, t1, t2, inst = config
        for row in range(1 << K):
            i = row % TABLE
            asn.assign_fixed(t1, row, i)
            asn.assign_fixed(t2, row, i * i % TABLE)
        for row, v in enumerate(self.values):
            asn.assign_advice(a, row, v % TABLE)
            asn.assign_advice(b, row, (v % TABLE) ** 2 % TABLE)
        asn.copy(a, 0, inst, 0)

    def instances(self):
        return [[self.values[0] % TABLE, 0]]


def make_trace(circuit, ck, ro):
    runner = CircuitRunner(K, bn256_fr, circuit, circuit.instances())
    S = runner.collect_plonk_structure()
    W = runner.collect_witness()
    return S, run_sps_protocol(S, ck, circuit.instances(), W, ro)


def test_two_round_sps_and_is_sat(ck):
    c = RangeCircuit([3, 7, 15, 0, 1, 1, 5])
    ro = create_ro()
    S, tr = make_trace(c, ck, ro)
    assert S.num_challenges == 2
    assert len(tr.u.W_commitments) == 2 and len(tr.u.challenges) == 2
    satisfy.is_sat(S, ck, create_ro(), tr.u, tr.w)


def test_two_round_lookup_violation_detected(ck):
    c = RangeCircuit([3, 99])  # 99 not in table
    ro = create_ro()
    S, tr = make_trace(c, ck, ro)
    with pytest.raises(satisfy.IsSatError):
        satisfy.is_sat(S, ck, create_ro(), tr.u, tr.w)


def test_three_round_sps_and_is_sat(ck):
    c = VectorRangeCircuit([2, 3, 5, 7, 11])
    ro = create_ro()
    S, tr = make_trace(c, ck, ro)
    assert S.num_challenges == 3
    assert len(tr.u.W_commitments) == 3
    satisfy.is_sat(S, ck, create_ro(), tr.u, tr.w)


@pytest.mark.skipif(SLOW_GATED, reason="sangria-fold-over-lookup e2e gated; SPS round + coefficient tests keep default coverage")
def test_fold_with_lookup(ck):
    """Sangria fold of two lookup traces (2-round SPS), relaxed is_sat."""
    ro = create_ro()
    c1, c2 = RangeCircuit([3, 7, 15]), RangeCircuit([1, 2, 4, 8])
    S, tr1 = make_trace(c1, ck, ro)
    _, tr2 = make_trace(c2, ck, ro)
    pp, vp = VanillaFS.setup_params(gold.identity(bn256_g1), S)
    f = S.field
    acc = RelaxedPlonkTrace(
        U=RelaxedPlonkInstance.new(bn256_g1, S.num_challenges, len(S.round_sizes), 0),
        W=RelaxedPlonkWitness([f.zeros((sz,)) for sz in S.round_sizes], f.zeros((S.n,))),
    )
    ro_p, ro_v, ro_n = create_ro(), create_ro(), create_ro()
    for step, tr in enumerate([tr1, tr2]):
        new_acc, cts = VanillaFS.prove(ck, pp, ro_p, acc, tr)
        Uv = VanillaFS.verify(vp, bn256_g1, ro_n, ro_v, acc.U, tr.u, cts)
        assert Uv == new_acc.U
        acc = new_acc
        errors = VanillaFS.is_sat(ck, S, acc, [t.u.instances for t in [tr1, tr2][: step + 1]])
        assert not errors, f"step {step}: {errors}"


def test_device_m_count_matches_host():
    """Device sort/search multiplicity kernel vs the host hashmap on a
    table with duplicate entries and inputs with misses."""
    import numpy as np

    from sirius_tpu.fields.constants import bn256_fr
    from sirius_tpu.fields.jfield import field_for
    from sirius_tpu.plonk.lookup import _device_m_count

    f = field_for(bn256_fr)
    p = f.p
    n = 64
    rng = np.random.default_rng(3)
    # small value range -> plenty of duplicates in t and repeats in l
    t = [int(v) for v in rng.integers(0, 12, size=n)]
    t[5] = t[9] = t[11]  # explicit duplicate group
    l = [int(v) for v in rng.integers(0, 16, size=n)]  # some miss the table
    l[0] = t[11]

    counts: dict[int, int] = {}
    for li in l:
        counts[li] = counts.get(li, 0) + 1
    seen: set[int] = set()
    want = []
    for ti in t:
        if ti in seen:
            want.append(0)
        else:
            seen.add(ti)
            want.append(counts.get(ti, 0))

    got = [int(v) for v in _device_m_count(f.encode(l), f.encode(t))]
    assert got == want


def test_device_lookup_coefficients_match_host(ck):
    """SPS lookup coefficient passes give identical witness vectors with
    the device m-count/batch-invert path and the host gold path."""
    import os

    import numpy as np

    c = RangeCircuit([3, 7, 15, 0, 1, 1, 5])
    runner = CircuitRunner(K, bn256_fr, c, c.instances())
    S = runner.collect_plonk_structure()
    W = runner.collect_witness()
    traces = {}
    for flag in ("0", "1"):
        os.environ["SIRIUS_TPU_DEVICE_LOOKUP"] = flag
        try:
            traces[flag] = run_sps_protocol(S, ck, c.instances(), W, create_ro())
        finally:
            del os.environ["SIRIUS_TPU_DEVICE_LOOKUP"]
    t0, t1 = traces["0"], traces["1"]
    assert t0.u.challenges == t1.u.challenges
    assert t0.u.W_commitments == t1.u.W_commitments
    for a, b in zip(t0.w.W, t1.w.W):
        assert (np.asarray(a) == np.asarray(b)).all()
