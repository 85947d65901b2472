"""Gadget stack: MainGate rows + on-circuit Poseidon vs off-circuit sponge.

The row-checker (eval_gate_mismatches) plays the MockProver role
(SURVEY.md §4 item 4)."""

import numpy as np
import pytest

from sirius_tpu.fields.constants import bn256_fr
from sirius_tpu.frontend.runner import CircuitRunner
from sirius_tpu.gadgets.main_gate import MainGate, RegionCtx
from sirius_tpu.gadgets.poseidon_chip import PoseidonChip
from sirius_tpu.ops.poseidon import PoseidonHash, poseidon_spec
from sirius_tpu.plonk.satisfy import eval_gate_mismatches, is_sat_perm
from sirius_tpu.plonk.structure import PlonkWitness
from sirius_tpu.plonk.sps import _concat_with_padding

P = bn256_fr.modulus


def check_rows(runner, S):
    """MockProver equivalent: zero violations of the compressed gate."""
    W = runner.collect_witness()
    w_dev = _concat_with_padding(S.field, W, S.n)
    mism = eval_gate_mismatches(S, [0] * S.num_challenges, PlonkWitness([w_dev]))
    bad = np.nonzero(np.asarray(mism))[0].tolist()
    assert not bad, f"unsatisfied rows: {bad[:10]}"


class ArithmeticCircuit:
    """Exercises add/sub/mul/pow5/rlc/select/is_zero helpers."""

    def configure(self, cs):
        cfg = MainGate.configure(cs, T=5)
        inst = cs.instance_column()
        return cfg, inst

    def synthesize(self, config, asn):
        cfg, inst = config
        mg = MainGate(cfg, asn.p)
        ctx = RegionCtx(asn)
        a = mg.assign_value(ctx, 17)
        b = mg.assign_value(ctx, 29)
        s = mg.add(ctx, a, b)
        d = mg.sub(ctx, s, a)  # == b
        m = mg.mul(ctx, a, b)
        p5 = mg.pow5(ctx, a)
        rlc = mg.random_linear_combination(ctx, [1, 2, 3], 10)  # 123
        one = mg.assign_constant(ctx, 1)
        mg.assert_bit(ctx, one)
        sel = mg.conditional_select(ctx, one, a, b)  # == a
        z = mg.is_zero_term(ctx, mg.sub(ctx, d, b))  # d-b == 0 -> z = 1
        assert d.value == 29 and m.value == 17 * 29 % asn.p
        assert p5.value == pow(17, 5, asn.p)
        assert rlc.value == 123
        assert sel.value == 17 and z.value == 1
        asn.copy(rlc.column, rlc.row, inst, 0)

    def instances(self):
        return [[123, 0]]


def test_main_gate_helpers():
    c = ArithmeticCircuit()
    runner = CircuitRunner(6, bn256_fr, c, c.instances())
    S = runner.collect_plonk_structure()
    check_rows(runner, S)
    # permutation check through the copy constraint to the instance
    from sirius_tpu.plonk.structure import PlonkInstance

    W = runner.collect_witness()
    w_dev = _concat_with_padding(S.field, W, S.n)
    is_sat_perm(S, PlonkInstance([], c.instances(), []), PlonkWitness([w_dev]))


class HashCircuit:
    """Absorb two witnessed values + one constant, squeeze, expose."""

    def __init__(self, x, y):
        self.x, self.y = x, y

    def configure(self, cs):
        cfg = MainGate.configure(cs, T=5)
        inst = cs.instance_column()
        return cfg, inst

    def synthesize(self, config, asn):
        cfg, inst = config
        mg = MainGate(cfg, asn.p)
        spec = poseidon_spec(bn256_fr, 5, 4, 10, 10)
        chip = PoseidonChip(mg, spec)
        ctx = RegionCtx(asn)
        x = mg.assign_value(ctx, self.x)
        y = mg.assign_value(ctx, self.y)
        out = chip.absorb_cell(x).absorb_cell(y).absorb_base(42).squeeze(ctx)
        asn.copy(out.column, out.row, inst, 0)
        self.out_value = out.value

    def expected(self):
        spec = poseidon_spec(bn256_fr, 5, 4, 10, 10)
        return PoseidonHash(spec).absorb_iter([self.x, self.y, 42]).squeeze(
            bn256_fr.num_bits
        )


@pytest.mark.parametrize("x,y", [(7, 11), (0, 2**200)])
def test_poseidon_chip_matches_host(x, y):
    c = HashCircuit(x, y)
    expected = c.expected()
    runner = CircuitRunner(10, bn256_fr, c, [[expected, 0]])
    S = runner.collect_plonk_structure()
    assert c.out_value == expected, "on-circuit != off-circuit hash"
    check_rows(runner, S)


class EccCircuit:
    """Scalar-mul + add of grumpkin points inside a bn256_fr circuit."""

    def __init__(self, k_scalar, nbits=16):
        self.k_scalar = k_scalar
        self.nbits = nbits

    def configure(self, cs):
        cfg = MainGate.configure(cs, T=5)
        inst = cs.instance_column()
        return cfg, inst

    def synthesize(self, config, asn):
        from sirius_tpu.fields import gold
        from sirius_tpu.fields.constants import grumpkin
        from sirius_tpu.gadgets.ecc_chip import EccChip

        cfg, inst = config
        mg = MainGate(cfg, asn.p)
        chip = EccChip(mg)
        ctx = RegionCtx(asn)

        g = gold.generator(grumpkin)
        p_assigned = chip.assign_affine(ctx, g)
        k_cell = mg.assign_value(ctx, self.k_scalar)
        bits = mg.le_num_to_bits(ctx, k_cell, self.nbits)
        res = chip.scalar_mul(ctx, p_assigned, bits)

        # also exercise complete add edge cases in-circuit
        doubled = chip.add(ctx, p_assigned, p_assigned)
        inf = chip.add(ctx, p_assigned, chip.negate(ctx, p_assigned))
        inf_flag = chip.is_infinity(ctx, inf)
        assert inf_flag.value == 1
        want_dbl = g.double()
        assert (doubled.x.value, doubled.y.value) == (want_dbl.x, want_dbl.y)

        want = g.mul(self.k_scalar)
        assert (res.x.value, res.y.value) == (want.x, want.y), "scalar_mul wrong"
        asn.copy(res.x.column, res.x.row, inst, 0)
        asn.copy(res.y.column, res.y.row, inst, 1)
        self.result = (res.x.value, res.y.value)


def test_ecc_chip_scalar_mul():
    from sirius_tpu.fields import gold
    from sirius_tpu.fields.constants import grumpkin

    k_scalar = 0xBEEF
    want = gold.generator(grumpkin).mul(k_scalar)
    c = EccCircuit(k_scalar)
    runner = CircuitRunner(12, bn256_fr, c, [[want.x, want.y]])
    S = runner.collect_plonk_structure()
    check_rows(runner, S)


class BigUintCircuit:
    """Nonnative a*b mod Fq inside an Fr circuit."""

    def __init__(self, a, b):
        self.a, self.b = a, b

    def configure(self, cs):
        return MainGate.configure(cs, T=5), cs.instance_column()

    def synthesize(self, config, asn):
        from sirius_tpu.fields.constants import bn256_fq
        from sirius_tpu.gadgets.big_uint_chip import BigUintChip

        cfg, inst = config
        mg = MainGate(cfg, asn.p)
        chip = BigUintChip(mg)  # 32x10 sangria geometry
        ctx = RegionCtx(asn)
        m = bn256_fq.modulus
        a = chip.assign_biguint(ctx, self.a)
        b = chip.assign_biguint(ctx, self.b)
        q, r = chip.mult_mod(ctx, a, b, m)
        assert r.value == self.a * self.b % m, "remainder wrong"
        # sum + reduce path
        s = chip.assign_sum(ctx, a, b)
        _, s_red = chip.red_mod(ctx, s, m)
        assert s_red.value == (self.a + self.b) % m
        # native decomposition roundtrip
        cell = mg.assign_value(ctx, 0x1234567890ABCDEF)
        limbs = chip.from_assigned_cell(ctx, cell, 64)
        native = chip.to_native_cell(ctx, limbs)
        assert native.value == cell.value
        self.r_value = r.value
        asn.copy(r.limbs[0].column, r.limbs[0].row, inst, 0)


def test_big_uint_mult_mod():
    from sirius_tpu.fields.constants import bn256_fq

    m = bn256_fq.modulus
    a, b = 0xDEADBEEF << 200 | 0x12345, m - 12345
    c = BigUintCircuit(a % m, b % m)
    runner = CircuitRunner(13, bn256_fr, c, [[(a % m) * (b % m) % m & 0xFFFFFFFF, 0]])
    S = runner.collect_plonk_structure()
    check_rows(runner, S)


def test_big_uint_less_than_edge():
    """assert_less_than_const at the boundary value m-1 (and 0)."""
    from sirius_tpu.fields.constants import bn256_fq

    m = bn256_fq.modulus

    class LtCircuit:
        def configure(self, cs):
            return MainGate.configure(cs, T=5), cs.instance_column()

        def synthesize(self, config, asn):
            from sirius_tpu.gadgets.big_uint_chip import BigUintChip

            cfg, inst = config
            mg = MainGate(cfg, asn.p)
            chip = BigUintChip(mg)
            ctx = RegionCtx(asn)
            hi = chip.assign_biguint(ctx, m - 1)
            chip.assert_less_than_const(ctx, hi, m)
            lo = chip.assign_biguint(ctx, 0)
            chip.assert_less_than_const(ctx, lo, m)
            asn.copy(hi.limbs[0].column, hi.limbs[0].row, inst, 0)

    c = LtCircuit()
    runner = CircuitRunner(12, bn256_fr, c, [[(m - 1) & 0xFFFFFFFF, 0]])
    S = runner.collect_plonk_structure()
    check_rows(runner, S)


def test_support_circuit():
    """Cyclefold EC co-processor: p_out = l0*p0 + l1*p1 with public IO."""
    from sirius_tpu.fields import gold
    from sirius_tpu.fields.constants import bn256_g1, bn256_fq
    from sirius_tpu.ivc.support_circuit import InstanceInput, SupportCircuit

    g = gold.generator(bn256_g1)
    inp = InstanceInput(g.mul(5), g.mul(9), 0xABCD, 0x1234)
    c = SupportCircuit(inp, num_bits=16)
    instances = [inp.into_instance(bn256_fq.modulus)]
    runner = CircuitRunner(12, bn256_fq, c, instances)
    S = runner.collect_plonk_structure()
    want = inp.p_out()
    assert c.out_value == (want.x, want.y)
    check_rows(runner, S)
    # permutation links every IO value to the instance column
    from sirius_tpu.plonk.structure import PlonkInstance

    W = runner.collect_witness()
    w_dev = _concat_with_padding(S.field, W, S.n)
    is_sat_perm(S, PlonkInstance([], instances, []), PlonkWitness([w_dev]))


def test_protogalaxy_verify_chip_matches_off_circuit():
    """On-circuit PG verifier folds to the same accumulator instance as the
    off-circuit `ProtoGalaxy.verify` (native-field transcript parity)."""
    import sys
    sys.path.insert(0, "tests")
    from fixtures import SquareCircuit
    from sirius_tpu.fields import gold
    from sirius_tpu.fields.constants import bn256_g1
    from sirius_tpu.curves.jpoint import BN256_G1
    from sirius_tpu.nifs.protogalaxy import AccumulatorInstance, ProtoGalaxy
    from sirius_tpu.ops.commitment import CommitmentKey
    from sirius_tpu.ops.poseidon import PoseidonHash, poseidon_spec
    from sirius_tpu.plonk.sps import run_sps_protocol
    from sirius_tpu.gadgets.protogalaxy_chip import ProtoGalaxyVerifyChip

    spec = poseidon_spec(bn256_fr, 3, 2, 4, 3)
    ck = CommitmentKey.setup(BN256_G1, 7, b"pg-test", use_cache=True, window_bits=4)

    c = SquareCircuit(3)
    inst = c.instances(bn256_fr.modulus)
    runner = CircuitRunner(4, bn256_fr, c, inst)
    S = runner.collect_plonk_structure()
    tr = run_sps_protocol(S, ck, inst, runner.collect_witness(), PoseidonHash(spec))

    pp, vp = ProtoGalaxy.setup_params(gold.identity(bn256_g1), S)
    acc = ProtoGalaxy.new_accumulator(pp, PoseidonHash(spec), tr, bn256_g1)
    new_acc, proof = ProtoGalaxy.prove(ck, pp, PoseidonHash(spec), acc, [tr])
    off = ProtoGalaxy.verify(
        vp, bn256_fr, PoseidonHash(spec), PoseidonHash(spec),
        AccumulatorInstance.from_acc(acc), [tr.u], proof,
    )

    class ChipCircuit:
        def configure(self, cs):
            return MainGate.configure(cs, T=5), cs.instance_column()

        def synthesize(self, config, asn):
            cfg, inst_col = config
            mg = MainGate(cfg, asn.p)
            chip = ProtoGalaxyVerifyChip(mg, spec)
            ctx = RegionCtx(asn)
            pp0 = mg.assign_constant(ctx, 0)
            a_acc = chip.assign_accumulator(ctx, AccumulatorInstance.from_acc(acc))
            a_in = [chip.assign_instance(ctx, tr.u)]
            pF, pK = chip.assign_proof(ctx, proof)
            folded, ls = chip.verify(ctx, bn256_fr, (pp0, pp0), a_acc, a_in, pF, pK)
            self.result = folded
            asn.copy(folded.e.column, folded.e.row, inst_col, 0)

    cc = ChipCircuit()
    runner2 = CircuitRunner(13, bn256_fr, cc, [[off.e % bn256_fr.modulus, 0]])
    S2 = runner2.collect_plonk_structure()
    check_rows(runner2, S2)
    got = cc.result
    p = bn256_fr.modulus
    assert got.e.value == off.e % p
    assert [b.value for b in got.betas] == [b % p for b in off.betas]
    assert [[v.value for v in row] for row in got.ins.instances] == [
        [v % p for v in row] for row in off.ins.instances
    ]
