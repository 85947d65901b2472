"""Cyclefold IVC: ProtoGalaxy on the primary curve + a Sangria-folded EC
support circuit on the secondary curve.

Replaces reference `src/ivc/cyclefold/` (SURVEY.md §2.6, call stack §3.4):

  next(z_i):
    1. ProtoGalaxy::prove(primary_acc, [primary_trace])   (off-circuit)
    2. extract gamma; [l0, l1] = L(gamma)
    3. delegate W_new = l0*W_acc + l1*W_inc to the support circuit on CSup,
       Sangria-fold the support trace into the support accumulator
    4. synthesize the cyclefold SFC (field = C1::Scalar):
         - on-circuit ProtoGalaxy verify (native field)     [PG chip]
         - on-circuit Sangria fold of the support instance  [fold chip,
           native ECC on CSup points]
         - delegation consistency: the support instance's public IO must
           equal the PG instance's W limbs / l0 / l1 / folded W limbs
         - input/output consistency markers
    5. SPS the new primary trace

Multi-round (lookup) step circuits are supported: a primary trace with R
W-commitments delegates R support-circuit folds per step, sequentially
Sangria-chained into one support accumulator (reference
`fold_support_circuit`, mod.rs:404-473).  MARKERS_LEN = 2 on the primary
instance, support instance column of 8.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from ..fields import gold
from ..fields.constants import CurveSpec, FieldSpec, bn256_fq, bn256_fr, bn256_g1, grumpkin
from ..frontend.circuit import ConstraintSystemBuilder
from ..frontend.runner import CircuitRunner
from ..gadgets.big_uint_chip import BigUintChip
from ..gadgets.fold_chip import FoldRelaxedPlonkInstanceChip
from ..gadgets.main_gate import AssignedCell, MainGate, RegionCtx
from ..gadgets.poseidon_chip import PoseidonChip
from ..gadgets.protogalaxy_chip import ProtoGalaxyVerifyChip
from ..nifs import protogalaxy as pg
from ..nifs import sangria as sg
from ..ops.poseidon import PoseidonHash
from ..plonk.sps import run_sps_protocol
from ..plonk.structure import PlonkInstance, PlonkTrace
from ..poly import lagrange
from ..util.digest import digest_ints_to_bits, into_curve_from_bits, structure_digest_stream
from ..util.profiling import span
from ..util.ro import MAX_BITS, NUM_CHALLENGE_BITS
from .sangria_ivc import default_ro_spec
from .step_circuit import StepCircuit
from .support_circuit import InstanceInput, SupportCircuit

SUPPORT_K = 14
SUPPORT_IO = 8


# ---------------------------------------------------------------------------
# Off-circuit marker hash for cyclefold (our canonical absorb order; the
# on-circuit mirror below follows it cell-for-cell)
# ---------------------------------------------------------------------------


def cyclefold_marker(
    spec: FieldSpec,
    pp_digest: tuple[int, int],
    step: int,
    z_0: Sequence[int],
    z_i: Sequence[int],
    self_acc: pg.AccumulatorInstance,
    support_acc: sg.RelaxedPlonkInstance,
) -> int:
    p = spec.modulus
    ro = PoseidonHash(default_ro_spec(spec))
    ro.absorb_field(pp_digest[0] % p)
    ro.absorb_field(pp_digest[1] % p)
    ro.absorb_field(step % p)
    for v in z_0:
        ro.absorb_field(v % p)
    for v in z_i:
        ro.absorb_field(v % p)
    # PG accumulator: W limbs, instances, challenges, betas, e (all native)
    pg.absorb_instance(ro, self_acc.ins, p)
    for b in self_acc.betas:
        ro.absorb_field(b % p)
    ro.absorb_field(self_acc.e % p)
    # support (sangria) accumulator over CSup: native point coords + bignum
    # casts — same shape as the sangria relaxed absorb
    support_acc.absorb_into(ro, p)
    return ro.squeeze(NUM_CHALLENGE_BITS) % p


# ---------------------------------------------------------------------------
# The cyclefold step-folding circuit (primary side)
# ---------------------------------------------------------------------------


@dataclass
class CyclefoldStepInputs:
    step: int
    pp_digest: tuple[int, int]
    z_0: list[int]
    z_i: list[int]
    self_acc: pg.AccumulatorInstance  # PG accumulator (instances only)
    self_incoming: PlonkInstance  # previous primary trace instance
    proof: pg.Proof
    support_acc: sg.RelaxedPlonkInstance  # sangria acc of support traces (CSup)
    support_incoming: list[PlonkInstance]  # this step's support trace instances (one per primary W commitment)
    support_cross_commits: list[list]  # grumpkin points, per support fold


class CyclefoldSFC:
    """Reference `src/ivc/cyclefold/sfc/` (simplified layout, same checks)."""

    def __init__(self, step_circuit: StepCircuit, inputs: CyclefoldStepInputs, field_spec: FieldSpec):
        self.sc = step_circuit
        self.inp = inputs
        self.spec = field_spec
        self.x1_value: Optional[int] = None

    def configure(self, cs: ConstraintSystemBuilder):
        mg_cfg = MainGate.configure(cs, T=5)
        inst = cs.instance_column()
        sc_cfg = self.sc.configure(cs)
        return (mg_cfg, inst, sc_cfg)

    def _marker_hash(self, ctx, mg, pg_chip, fold_chip, pp, step_cell, z_0, z_i, acc_assigned, support_assigned):
        """On-circuit mirror of `cyclefold_marker`."""
        ro = PoseidonChip(mg, default_ro_spec(self.spec))
        ro.absorb_cell(pp[0])
        ro.absorb_cell(pp[1])
        ro.absorb_cell(step_cell)
        ro.absorb_iter(z_0)
        ro.absorb_iter(z_i)
        pg_chip._absorb_instance(ro, acc_assigned.ins)
        ro.absorb_iter(acc_assigned.betas)
        ro.absorb_cell(acc_assigned.e)
        fold_chip.absorb_relaxed(ro, ctx, support_assigned)
        out = ro.squeeze(ctx)
        bits = mg.le_num_to_bits(ctx, out, mg.p.bit_length())
        return mg.le_bits_to_num(ctx, bits[:NUM_CHALLENGE_BITS])

    def synthesize(self, config, asn):
        import os as _os

        _dbg = _os.environ.get("SIRIUS_TPU_DEBUG_SFC")

        def _phase(ctx_, name):
            if _dbg:
                print(f"[sfc] {name}: offset={ctx_.offset}", flush=True)

        mg_cfg, inst, sc_cfg = config
        mg = MainGate(mg_cfg, asn.p)
        inp = self.inp
        spec = self.spec
        ro_spec = default_ro_spec(spec)
        pg_chip = ProtoGalaxyVerifyChip(mg, ro_spec)
        # support instances live in CSup::Scalar (= Fq): carried as 32x10
        # nonnative limbs (reference uses 64x20; geometry is internal to the
        # fold arithmetic and 32x10 costs 4x fewer rows — PARITY.md)
        bn = BigUintChip(mg)
        fold_chip = FoldRelaxedPlonkInstanceChip(mg, ro_spec, grumpkin, bn)
        ctx = RegionCtx(asn)

        pp0 = mg.assign_value(ctx, inp.pp_digest[0])
        pp1 = mg.assign_value(ctx, inp.pp_digest[1])
        step_cell = mg.assign_value(ctx, inp.step)
        z_0 = [mg.assign_value(ctx, v) for v in inp.z_0]
        z_i = [mg.assign_value(ctx, v) for v in inp.z_i]

        acc_assigned = pg_chip.assign_accumulator(ctx, inp.self_acc)
        incoming_assigned = pg_chip.assign_instance(ctx, inp.self_incoming)
        pF, pK = pg_chip.assign_proof(ctx, inp.proof)
        support_acc_assigned = fold_chip.assign_relaxed(ctx, inp.support_acc)
        support_in_assigned = [
            fold_chip.assign_incoming(ctx, u) for u in inp.support_incoming
        ]
        support_T_assigned = [
            [fold_chip.ecc.assign_affine(ctx, t) for t in cross]
            for cross in inp.support_cross_commits
        ]

        _phase(ctx, "assignments")
        is_zero_step = mg.is_zero_term(ctx, step_cell)

        # --- input marker check (bypassed at base case)
        computed_x0 = self._marker_hash(
            ctx, mg, pg_chip, fold_chip, (pp0, pp1), step_cell, z_0, z_i,
            acc_assigned, support_acc_assigned,
        )
        # the incoming trace's OUTPUT marker (markers[1]) binds the state the
        # SFC is folding from; markers[0] is the previous chain link, already
        # checked by the previous step's SFC.  (Comparing against markers[0]
        # here was a latent bug that only fires once a next-trace is folded —
        # i.e. from the second fold step on.)
        u_markers = incoming_assigned.instances[0]
        expected = mg.conditional_select(ctx, is_zero_step, u_markers[1], computed_x0)
        ctx.constrain_equal(expected, u_markers[1])

        _phase(ctx, "x0-marker-check")
        # --- on-circuit SPS verify of the incoming trace (reference
        # `verify_sps`, ivc/protogalaxy/mod.rs:946-975): re-derive its SPS
        # challenges in-circuit; bypassed at the base case (dry incoming)
        pg_chip.verify_sps(
            ctx, incoming_assigned, bn, NUM_CHALLENGE_BITS, bypass=is_zero_step
        )

        _phase(ctx, "sps-verify")
        # --- on-circuit ProtoGalaxy verify
        folded_acc, ls = pg_chip.verify(
            ctx, spec, (pp0, pp1), acc_assigned, [incoming_assigned], pF, pK
        )

        _phase(ctx, "pg-verify")
        # --- delegation consistency: the i-th support instance's public IO
        # binds p0 = acc W[i], p1 = incoming W[i], scalars = (l0, l1),
        # p_out = new W[i].  Support IO values live in Fq; their limb
        # decompositions must match the PG instance's W limbs, and l0/l1
        # recompose to the L(gamma) cells natively.  Each support instance is
        # then Sangria-folded on-circuit into the chained accumulator
        # (reference sangria_adapter, sfc/mod.rs:258-276).
        new_Ws = []
        folded_support = support_acc_assigned
        for i, (sup_in, sup_T) in enumerate(zip(support_in_assigned, support_T_assigned)):
            sup = sup_in.markers  # 8 BigUintCells
            for limb_a, limb_b in zip(sup[0].limbs + sup[1].limbs,
                                      acc_assigned.ins.W_commitments[i].x + acc_assigned.ins.W_commitments[i].y):
                ctx.constrain_equal(limb_a, limb_b)
            for limb_a, limb_b in zip(sup[2].limbs + sup[3].limbs,
                                      incoming_assigned.W_commitments[i].x + incoming_assigned.W_commitments[i].y):
                ctx.constrain_equal(limb_a, limb_b)
            l0_native = bn.to_native_cell(ctx, sup[4])
            l1_native = bn.to_native_cell(ctx, sup[5])
            exp_l0 = mg.conditional_select(ctx, is_zero_step, l0_native, ls[0])
            exp_l1 = mg.conditional_select(ctx, is_zero_step, l1_native, ls[1])
            ctx.constrain_equal(exp_l0, l0_native)
            ctx.constrain_equal(exp_l1, l1_native)
            # new W[i] limbs adopted from the support output
            new_Ws.append(type(acc_assigned.ins.W_commitments[0])(sup[6].limbs, sup[7].limbs))
            # --- on-circuit Sangria fold of this support instance (native ECC)
            folded_support, _r = fold_chip.fold(
                ctx, folded_support, sup_in, sup_T, (pp0, pp1)
            )
        folded_acc.ins.W_commitments = new_Ws

        _phase(ctx, "delegation+support-folds")
        # --- base-case selects
        def sel_cells(a, b):
            return mg.conditional_select(ctx, is_zero_step, a, b)

        from ..gadgets.protogalaxy_chip import (
            AssignedAccumulatorInstance,
            AssignedBigUintPoint,
            AssignedPlonkInstancePG,
        )

        acc_out = AssignedAccumulatorInstance(
            AssignedPlonkInstancePG(
                [
                    AssignedBigUintPoint(
                        [sel_cells(a, b) for a, b in zip(acc_W.x, new_W.x)],
                        [sel_cells(a, b) for a, b in zip(acc_W.y, new_W.y)],
                    )
                    for acc_W, new_W in zip(acc_assigned.ins.W_commitments, new_Ws)
                ],
                [
                    [sel_cells(a, b) for a, b in zip(ra, rb)]
                    for ra, rb in zip(acc_assigned.ins.instances, folded_acc.ins.instances)
                ],
                [sel_cells(a, b) for a, b in zip(acc_assigned.ins.challenges, folded_acc.ins.challenges)],
            ),
            [sel_cells(a, b) for a, b in zip(acc_assigned.betas, folded_acc.betas)],
            sel_cells(acc_assigned.e, folded_acc.e),
        )
        from .sangria_ivc import StepFoldingCircuit as _SFC

        support_out = _SFC._select_relaxed(
            None, ctx, mg, is_zero_step, support_acc_assigned, folded_support
        )

        _phase(ctx, "base-selects")
        # --- user step
        sc_ctx = RegionCtx(asn, ctx.offset)
        z_next = self.sc.synthesize_step(sc_cfg, sc_ctx, z_i)
        ctx.offset = sc_ctx.offset

        _phase(ctx, "user-step")
        self.z_next_values = [c.value for c in z_next]
        # --- output marker
        step_next = mg.add_with_const(ctx, step_cell, 1)
        x1 = self._marker_hash(
            ctx, mg, pg_chip, fold_chip, (pp0, pp1), step_next, z_0, z_next,
            acc_out, support_out,
        )

        _phase(ctx, "out-marker")
        asn.copy(u_markers[1].column, u_markers[1].row, inst, 0)
        asn.copy(x1.column, x1.row, inst, 1)
        self.x1_value = x1.value
        self.x0_value = u_markers[1].value

    def instances(self, markers: Sequence[int]) -> list[list[int]]:
        return [list(markers)]


# ---------------------------------------------------------------------------
# Witness-tape input packing (trace-once / replay-native synthesis; see
# frontend/taped.py).  `_cf_pack` is the single canonical walk over the
# dynamic leaves of CyclefoldStepInputs — both the flattener (replay inputs)
# and the tracer (Tr wrapping) ride it, so the orders cannot drift.
# ---------------------------------------------------------------------------


def _cf_pack(inp: CyclefoldStepInputs, P) -> CyclefoldStepInputs:
    from types import SimpleNamespace

    from ..frontend.taped import _TrPoint, point_leaves

    def pt(g):
        x, y = point_leaves(g)
        return _TrPoint(P(x), P(y))

    def pi(u):
        return SimpleNamespace(
            W_commitments=[pt(c) for c in u.W_commitments],
            instances=[[P(v) for v in row] for row in u.instances],
            challenges=[P(v) for v in u.challenges],
        )

    acc, sup = inp.self_acc, inp.support_acc
    return CyclefoldStepInputs(
        step=P(inp.step),
        pp_digest=(P(inp.pp_digest[0]), P(inp.pp_digest[1])),
        z_0=[P(v) for v in inp.z_0],
        z_i=[P(v) for v in inp.z_i],
        self_acc=SimpleNamespace(
            ins=pi(acc.ins), betas=[P(b) for b in acc.betas], e=P(acc.e)
        ),
        self_incoming=pi(inp.self_incoming),
        proof=SimpleNamespace(
            poly_F=SimpleNamespace(coeffs=[P(c) for c in inp.proof.poly_F.coeffs]),
            poly_K=SimpleNamespace(coeffs=[P(c) for c in inp.proof.poly_K.coeffs]),
        ),
        support_acc=SimpleNamespace(
            W_commitments=[pt(c) for c in sup.W_commitments],
            E_commitment=pt(sup.E_commitment),
            consistency_markers=[P(v) for v in sup.consistency_markers],
            challenges=[P(v) for v in sup.challenges],
            u=P(sup.u),
            sc_instances_hash_acc=(
                None
                if sup.sc_instances_hash_acc is None
                else P(sup.sc_instances_hash_acc)
            ),
        ),
        support_incoming=[pi(u) for u in inp.support_incoming],
        support_cross_commits=[
            [pt(t) for t in cross] for cross in inp.support_cross_commits
        ],
    )


def _cf_flatten(inp: CyclefoldStepInputs, sc=None) -> list[int]:
    from ..frontend.taped import sc_dynamic_values

    out: list[int] = []

    def P(v):
        out.append(int(v))
        return v

    _cf_pack(inp, P)
    if sc is not None:
        out.extend(sc_dynamic_values(sc))
    return out


def _sup_flatten(si: InstanceInput) -> list[int]:
    from ..frontend.taped import point_leaves

    return [*point_leaves(si.p0), *point_leaves(si.p1), si.l0, si.l1]


# ---------------------------------------------------------------------------
# Public params + driver
# ---------------------------------------------------------------------------


class CyclefoldPublicParams:
    """Reference `ivc/cyclefold/.../public_params.rs` (simplified)."""

    def __init__(self, step_circuit: StepCircuit, k: int, ck_primary, ck_support):
        self.sc = step_circuit
        self.k = k
        self.ck1 = ck_primary
        self.ck2 = ck_support
        self.f1 = bn256_fr
        self.f2 = bn256_fq

        from ..frontend.tape import TapeBuilder
        from ..frontend.taped import TapedSynthesis, _TrPoint, tape_enabled

        self.support_taped = None
        self.sfc_taped = None
        use_tape = tape_enabled()

        # support structure (shape-stable across inputs); when taping is on,
        # the dry structure synthesis doubles as the witness trace
        if use_tape:
            sup_tape = TapeBuilder()
            si = sup_tape.inputs(6)
            sup_inp = InstanceInput(_TrPoint(si[0], si[1]), _TrPoint(si[2], si[3]), si[4], si[5])
            sup_instances = [[0] * SUPPORT_IO]
        else:
            sup_inp = InstanceInput(gold.identity(bn256_g1), gold.identity(bn256_g1), 0, 0)
            sup_instances = [sup_inp.into_instance(self.f2.modulus)]
        sup = SupportCircuit(sup_inp, num_bits=self.f1.num_bits)
        sup_runner = CircuitRunner(SUPPORT_K, self.f2, sup, sup_instances)
        self.S_support = sup_runner.collect_plonk_structure()
        assert self.S_support.num_challenges == 0
        if use_tape:
            self.support_taped = TapedSynthesis(sup_tape, sup_runner._asn, named={})

        # primary SFC structure via dry run (gate count probed first so the
        # dry proof-poly lengths match the real ones)
        probe_cs = ConstraintSystemBuilder()
        CyclefoldSFC(step_circuit, None, self.f1).configure(probe_cs)
        from ..frontend.runner import ConstraintSystemMetainfo
        from ..poly.expression import QueryIndexContext

        probe_meta = ConstraintSystemMetainfo.build(k, probe_cs)
        self.n_gates = max(len(probe_meta.gates), 1)
        num_lookups = (
            probe_meta.lookup_arguments.num_lookups() if probe_meta.lookup_arguments else 0
        )
        probe_ctx = QueryIndexContext(
            num_selectors=probe_cs.num_selectors,
            num_fixed=probe_cs.num_fixed,
            num_advice=probe_cs.num_advice,
            num_lookups=num_lookups,
            num_challenges=probe_meta.num_challenges,
        )
        # max raw gate degree feeds the PG proof-poly domain sizes, so a step
        # circuit with higher-degree gates must change the dry poly_K length
        # (same bug class as the sangria cross-term count: it is NOT static)
        self.max_gate_degree = max(
            (g.degree(probe_ctx) for g in probe_meta.gates), default=0
        )
        # primary instance shape (W commitments / SPS challenges) is also
        # step-circuit-dependent (extra gates add a compression challenge)
        self.num_challenges_primary = probe_meta.num_challenges
        self.num_witness_primary = len(probe_meta.round_sizes)
        dry_inputs = self._dry_inputs()
        restore_sc = lambda: None
        if use_tape:
            from ..frontend.taped import sc_trace_bind

            sfc_tape = TapeBuilder()
            dry_inputs = _cf_pack(dry_inputs, lambda v: sfc_tape.input())
            restore_sc = sc_trace_bind(sfc_tape, step_circuit)
        dry = CyclefoldSFC(step_circuit, dry_inputs, self.f1)
        runner = CircuitRunner(k, self.f1, dry, [[0, 0]])
        self.S_primary = runner.collect_plonk_structure()
        restore_sc()
        assert len(self.S_primary.gates) == self.n_gates
        if use_tape:
            named = {"x0": dry.x0_value, "x1": dry.x1_value}
            named.update({f"z{i}": v for i, v in enumerate(dry.z_next_values)})
            self.sfc_taped = TapedSynthesis(sfc_tape, runner._asn, named=named)

        bits = digest_ints_to_bits(
            structure_digest_stream(self.S_primary) + structure_digest_stream(self.S_support)
        )
        self.digest = into_curve_from_bits(bn256_g1, bits)
        self.pg_pp = pg.ProverParam(self.S_primary, self.digest_coords())
        self.sangria_pp_support, _ = sg.VanillaFS.setup_params(self.digest, self.S_support)

    def digest_coords(self):
        d = self.digest
        return (0, 0) if d.is_identity else (d.x, d.y)

    def digest_hex(self) -> str:
        x, y = self.digest_coords()
        return f"{x:064x}{y:064x}"

    def num_cross_terms_support(self) -> int:
        return self.S_support.get_degree_for_folding() - 1

    def count_padded(self) -> int:
        c = (1 << self.k) * self.n_gates
        t = 1
        while t < c:
            t *= 2
        return t

    def betas_count(self) -> int:
        return self.count_padded().bit_length() - 1

    def _dry_inputs(self) -> CyclefoldStepInputs:
        count = self.count_padded()
        return CyclefoldStepInputs(
            step=0,
            pp_digest=(0, 0),
            z_0=[0] * self.sc.arity,
            z_i=[0] * self.sc.arity,
            self_acc=self._initial_pg_acc_instance(),
            self_incoming=self._default_primary_incoming(),
            proof=pg.Proof(
                _zero_poly(self.f1, _f_len(count)),
                _zero_poly(self.f1, self._dry_k_len()),
            ),
            support_acc=sg.RelaxedPlonkInstance.new(
                grumpkin, 0, 1, 0, markers_len=SUPPORT_IO
            ),
            support_incoming=[
                PlonkInstance([gold.identity(grumpkin)], [[0] * SUPPORT_IO], [])
                for _ in range(self.num_witness_primary)
            ],
            support_cross_commits=[
                [gold.identity(grumpkin)] * self.num_cross_terms_support()
                for _ in range(self.num_witness_primary)
            ],
        )

    def _dry_k_len(self) -> int:
        """poly_K length for L=1 from the probed max gate degree (mirrors
        `PolyContext.fft_log_domain_size_K` before S_primary exists)."""
        g_pts = pg._next_pow2(1 * self.max_gate_degree + 1)
        return 1 << pg._next_pow2(max(g_pts + 1 - 2, 1))

    def _default_primary_incoming(self) -> PlonkInstance:
        return PlonkInstance(
            [gold.identity(bn256_g1)] * self.num_witness_primary,
            [[0, 0]],
            [0] * self.num_challenges_primary,
        )

    def _initial_pg_acc_instance(self) -> pg.AccumulatorInstance:
        return pg.AccumulatorInstance(
            ins=self._default_primary_incoming(),
            betas=[0] * self.betas_count(),
            e=0,
        )


def _f_len(count_padded: int) -> int:
    m = count_padded.bit_length() - 1
    t = 1
    while t < m + 1:
        t *= 2
    return t


def _k_len(S) -> int:
    # reference K-domain rule via the same PolyContext the prover uses
    return 1 << pg.PolyContext(S, 1).fft_log_domain_size_K


def _zero_poly(spec, n):
    from ..poly.univariate import UnivariatePoly

    return UnivariatePoly(spec, [0] * n)


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


class CyclefoldIVC:
    """Reference `ivc/cyclefold/incrementally_verifiable_computation` (new /
    next / verify)."""

    def __init__(self, pp: CyclefoldPublicParams, z_0: Sequence[int]):
        f1 = pp.f1
        self.pp = pp
        self.step = 1
        self.z_0 = [v % f1.modulus for v in z_0]

        # initial PG accumulator from the all-zero dry trace
        dry_trace = PlonkTrace(
            pp._default_primary_incoming(),
            _zero_witness(pp.S_primary),
        )
        self.self_acc = pg.ProtoGalaxy.new_accumulator(
            pp.pg_pp, PoseidonHash(default_ro_spec(f1)), dry_trace, bn256_g1
        )
        self.support_acc = sg.RelaxedPlonkTrace(
            U=sg.RelaxedPlonkInstance.new(grumpkin, 0, 1, 0, markers_len=SUPPORT_IO),
            W=_zero_relaxed_witness(pp.S_support),
        )

        inputs = pp._dry_inputs()
        inputs.pp_digest = pp.digest_coords()
        inputs.z_0 = list(self.z_0)
        inputs.z_i = list(self.z_0)
        inputs.self_acc = pg.AccumulatorInstance.from_acc(self.self_acc)
        inputs.support_acc = self.support_acc.U
        W, z_out, x1 = self._sfc_witness(
            inputs, lambda z: cyclefold_marker(
                f1, pp.digest_coords(), 1, self.z_0, z,
                pg.AccumulatorInstance.from_acc(self.self_acc), self.support_acc.U,
            ),
        )
        instances = [[0, x1]]
        self.primary_trace = run_sps_protocol(
            pp.S_primary, pp.ck1, instances, W, PoseidonHash(default_ro_spec(f1))
        )
        self.z_i = z_out
        self.support_pub_instances: list = []

    def _sfc_witness(self, inputs: CyclefoldStepInputs, marker_of_z, x0: int = 0):
        """Produce the SFC advice witness for `inputs`: native tape replay
        when the pp carries a trace (the default), else direct synthesis.
        Returns (W, z_next, x1) with the on-/off-circuit X1 cross-checked."""
        pp = self.pp
        arity = pp.sc.arity
        if pp.sfc_taped is not None:
            from ..frontend.taped import sc_is_stateful

            z_host = None
            if sc_is_stateful(pp.sc):
                # advance the prover's host state (e.g. the Merkle DB) and
                # refresh the dynamic witness BEFORE flattening
                z_host = pp.sc.process_step(inputs.z_i, pp.k, pp.f1)
            W, named = pp.sfc_taped.replay(_cf_flatten(inputs, pp.sc))
            z_next = [named[f"z{i}"] for i in range(arity)]
            if z_host is not None:
                assert z_next == [v % pp.f1.modulus for v in z_host], \
                    "taped replay z_next diverges from host process_step"
            x1 = marker_of_z(z_next)
            assert named["x1"] == x1, (
                "cyclefold: on/off-circuit X1 mismatch (a stateful step "
                "circuit must implement dynamic_witness/bind_witness — see "
                "ivc/step_circuit.py)"
            )
            return W, z_next, x1
        z_next = pp.sc.process_step(inputs.z_i, pp.k, pp.f1)
        x1 = marker_of_z(z_next)
        sfc = CyclefoldSFC(pp.sc, inputs, pp.f1)
        runner = CircuitRunner(pp.k, pp.f1, sfc, [[x0, x1]])
        W = runner.collect_witness()
        assert sfc.x1_value == x1, "cyclefold: on/off-circuit X1 mismatch"
        return W, z_next, x1

    def _support_witness(self, sup_circuit: SupportCircuit):
        pp = self.pp
        if pp.support_taped is not None:
            W, _ = pp.support_taped.replay(_sup_flatten(sup_circuit.inp))
            return W
        sup_instances = [sup_circuit.inp.into_instance(pp.f2.modulus)]
        sup_runner = CircuitRunner(SUPPORT_K, pp.f2, sup_circuit, sup_instances)
        return sup_runner.collect_witness()

    def next(self):
        """One cyclefold step (reference `next`, mod.rs:210-324)."""
        pp = self.pp
        f1 = pp.f1
        ro = lambda: PoseidonHash(default_ro_spec(f1))

        prev_acc_ins = pg.AccumulatorInstance.from_acc(self.self_acc)
        prev_trace = self.primary_trace

        with span("pg_prove"):
            new_acc, proof = pg.ProtoGalaxy.prove(
                pp.ck1, pp.pg_pp, ro(), self.self_acc, [prev_trace]
            )

        # re-derive gamma verifier-style to evaluate L0/L1
        ro2 = ro()
        pp.pg_pp.absorb_into(ro2, f1.modulus)
        prev_acc_ins.absorb_into(ro2, f1.modulus)
        pg.absorb_instance(ro2, prev_trace.u, f1.modulus)
        delta = ro2.squeeze(MAX_BITS) % f1.modulus
        for c in proof.poly_F.coeffs:
            ro2.absorb_field(c % f1.modulus)
        alpha = ro2.squeeze(MAX_BITS) % f1.modulus
        for c in proof.poly_K.coeffs:
            ro2.absorb_field(c % f1.modulus)
        gamma = ro2.squeeze(MAX_BITS) % f1.modulus
        l0, l1 = list(
            lagrange.iter_eval_lagrange_poly_for_cyclic_group(f1, gamma, 1)
        )[:2]

        # --- support-circuit delegation, one fold per W-commitment pair:
        # W_new[i] = l0*W_acc[i] + l1*W_inc[i], sequentially Sangria-chained
        # (reference `fold_support_circuit`, mod.rs:404-473)
        new_support_acc = self.support_acc
        support_incoming: list[PlonkInstance] = []
        support_cross: list[list] = []
        _sup_span = span("support_folds")
        _sup_span.__enter__()
        for i, (W_a, W_i) in enumerate(
            zip(prev_acc_ins.ins.W_commitments, prev_trace.u.W_commitments)
        ):
            sup_input = InstanceInput(W_a, W_i, l0, l1)
            expected_W = sup_input.p_out()
            assert expected_W == new_acc.trace.u.W_commitments[i], \
                f"support delegation #{i} disagrees with the PG fold"
            sup_circuit = SupportCircuit(sup_input, num_bits=f1.num_bits)
            sup_instances = [sup_input.into_instance(pp.f2.modulus)]
            with span("support_witness"):
                sup_W = self._support_witness(sup_circuit)
            with span("support_sps"):
                support_trace = run_sps_protocol(
                    pp.S_support, pp.ck2, sup_instances, sup_W, PoseidonHash(default_ro_spec(f1))
                )
            with span("support_sangria_prove"):
                new_support_acc, sup_cross = sg.VanillaFS.prove(
                    pp.ck2, pp.sangria_pp_support, ro(), new_support_acc, support_trace
                )
            support_incoming.append(support_trace.u)
            support_cross.append(sup_cross)
            self.support_pub_instances.append(support_trace.u.instances)

        _sup_span.__exit__(None, None, None)
        # --- synthesize the SFC (tape replay on the hot path)
        inputs = CyclefoldStepInputs(
            step=self.step,
            pp_digest=pp.digest_coords(),
            z_0=list(self.z_0),
            z_i=list(self.z_i),
            self_acc=prev_acc_ins,
            self_incoming=prev_trace.u,
            proof=proof,
            support_acc=self.support_acc.U,
            support_incoming=support_incoming,
            support_cross_commits=support_cross,
        )
        x0 = prev_trace.u.instances[0][1]
        with span("sfc_witness"):
            W, z_next, x1 = self._sfc_witness(
                inputs, lambda z: cyclefold_marker(
                    f1, pp.digest_coords(), self.step + 1, self.z_0, z,
                    pg.AccumulatorInstance.from_acc(new_acc), new_support_acc.U,
                ), x0=x0,
            )
        instances = [[x0, x1]]

        with span("sps_primary"):
            self.primary_trace = run_sps_protocol(
                pp.S_primary, pp.ck1, instances, W, PoseidonHash(default_ro_spec(f1))
            )
        self.self_acc = new_acc
        self.support_acc = new_support_acc
        self.z_i = z_next
        self.step += 1

    def checkpoint(self, path: str):
        """Persist the full IVC state, keyed by the pp digest (SURVEY.md §5:
        the reference never serializes accumulators; 2^16-step folds need it)."""
        from ..util.checkpoint import save_cyclefold_state

        save_cyclefold_state(path, self, self.pp.digest_hex())

    @staticmethod
    def resume(pp: "CyclefoldPublicParams", path: str) -> "CyclefoldIVC":
        """Reload a checkpointed IVC; refuses checkpoints from different
        public parameters."""
        from ..util.checkpoint import load_cyclefold_state

        return load_cyclefold_state(path, pp, pp.digest_hex())

    def verify(self) -> list:
        """Marker replay + is_sat on accumulators and the pending trace
        (reference `verify`, mod.rs:337-393)."""
        pp = self.pp
        f1 = pp.f1
        errors = []
        # the pending trace's X1 commits to the *current* accumulator state
        expected_x1 = cyclefold_marker(
            f1, pp.digest_coords(), self.step, self.z_0, self.z_i,
            pg.AccumulatorInstance.from_acc(self.self_acc), self.support_acc.U,
        )
        if expected_x1 != self.primary_trace.u.instances[0][1] % f1.modulus:
            errors.append("marker X1 mismatch")
        with span("verify_pg_is_sat"):
            errors += [
                f"pg: {e}"
                for e in pg.ProtoGalaxy.is_sat(
                    pp.ck1, pp.S_primary, self.self_acc, check_commit=False
                )
            ]
        with span("verify_support_is_sat"):
            errors += [
                f"support: {e}"
                for e in sg.VanillaFS.is_sat(
                    pp.ck2, pp.S_support, self.support_acc, self.support_pub_instances
                )
            ]
        from ..plonk import satisfy

        with span("verify_primary_trace"):
            try:
                satisfy.is_sat(
                    pp.S_primary, pp.ck1, PoseidonHash(default_ro_spec(f1)),
                    self.primary_trace.u, self.primary_trace.w, check_commit=False,
                )
            except satisfy.IsSatError as e:
                errors.append(f"primary trace: {e}")
        # one RLC MSM covers every primary-curve commitment opening: the PG
        # accumulator's witness rounds AND the pending trace's
        with span("verify_commitments"):
            pairs = list(
                zip(self.self_acc.trace.w.W, self.self_acc.trace.u.W_commitments)
            ) + list(zip(self.primary_trace.w.W, self.primary_trace.u.W_commitments))
            check = getattr(pp.ck1, "batched_commit_check", None)
            if check is not None:
                bad = check(pairs)
                if bad:
                    errors.append(f"commitment mismatch (pair indices {bad})")
            else:
                for i, (W, C) in enumerate(pairs):
                    if pp.ck1.commit_device(W) != C:
                        errors.append(f"commitment mismatch (pair {i})")
        return errors


def _zero_witness(S):
    from ..plonk.structure import PlonkWitness

    return PlonkWitness.zeros(S.field, S.round_sizes)


def _zero_relaxed_witness(S):
    return sg.RelaxedPlonkWitness(
        [S.field.zeros((sz,)) for sz in S.round_sizes], S.field.zeros((S.n,))
    )
