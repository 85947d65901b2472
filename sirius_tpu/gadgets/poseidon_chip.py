"""On-circuit Poseidon sponge over the MainGate.

Replaces reference `src/poseidon/poseidon_circuit.rs` (SURVEY.md §2.5).
Verifies the same (unoptimized-schedule) permutation as the off-circuit
sponge in `ops/poseidon.py`, so on-/off-circuit hashes agree bit-exactly
within this framework.

Row layout per permutation round (width T):
  full round:    T ARC rows (t_j = s_j + rc_j) + T mix rows
                 (out_i = sum_j M_ij * t_j^5 via q_5 = M row)
  partial round: 1 ARC row (t_0) + T mix rows
                 (out_i = M_i0*t_0^5 + sum_{j>0} M_ij*s_j + sum_{j>0} M_ij*rc_j)
"""

from __future__ import annotations

from typing import Sequence

from ..ops.poseidon import PoseidonSpec
from .main_gate import AssignedCell, MainGate, RegionCtx


class PoseidonChip:
    """ROCircuitTrait analogue (reference `random_oracle.rs:83-125`)."""

    def __init__(self, main_gate: MainGate, spec: PoseidonSpec):
        self.mg = main_gate
        self.spec = spec
        self.buf: list[AssignedCell | int] = []

    def absorb_base(self, v: int) -> "PoseidonChip":
        """Absorb a constant (unassigned) value."""
        self.buf.append(v % self.mg.p)
        return self

    def absorb_cell(self, cell: AssignedCell) -> "PoseidonChip":
        self.buf.append(cell)
        return self

    def absorb_iter(self, cells) -> "PoseidonChip":
        for c in cells:
            self.buf.append(c)
        return self

    # -- permutation ------------------------------------------------------------
    def _arc_cell(self, ctx: RegionCtx, s, rc: int) -> AssignedCell:
        mg = self.mg
        if isinstance(s, AssignedCell):
            return mg.add_with_const(ctx, s, rc)
        return mg.assign_constant(ctx, (s + rc) % mg.p)

    def _round(self, ctx: RegionCtx, state: list, r: int, is_full: bool) -> list:
        mg, spec, p = self.mg, self.spec, self.mg.p
        rcs = spec.round_constants[r]
        mds = spec.mds
        T = spec.t

        def val(s):
            return s.value if isinstance(s, AssignedCell) else s % p

        if is_full:
            ts = [self._arc_cell(ctx, state[j], rcs[j]) for j in range(T)]
            new_state = []
            for i in range(T):
                out = sum(mds[i][j] * pow(ts[j].value, 5, p) for j in range(T)) % p
                cell = mg.apply(
                    ctx,
                    ts,
                    q_5=[mds[i][j] for j in range(T)],
                    out_val=out,
                    q_o=p - 1,
                )
                new_state.append(cell)
            return new_state

        t0 = self._arc_cell(ctx, state[0], rcs[0])
        new_state = []
        for i in range(T):
            rc_sum = sum(mds[i][j] * rcs[j] for j in range(1, T)) % p
            out = (
                mds[i][0] * pow(t0.value, 5, p)
                + sum(mds[i][j] * val(state[j]) for j in range(1, T))
                + rc_sum
            ) % p
            q5 = [mds[i][0]] + [0] * (T - 1)
            q1 = [0] + [mds[i][j] for j in range(1, T)]
            cell = mg.apply(
                ctx,
                [t0, *state[1:]],
                q_1=q1,
                q_5=q5,
                rc=rc_sum,
                out_val=out,
                q_o=p - 1,
            )
            new_state.append(cell)
        return new_state

    def permutation(self, ctx: RegionCtx, state: list, inputs: Sequence) -> list:
        """Absorb inputs (+1 padding marker) then run the round schedule —
        mirrors the off-circuit `permute` exactly."""
        mg, spec = self.mg, self.spec
        state = list(state)
        for i, v in enumerate(inputs):
            if isinstance(v, AssignedCell):
                if isinstance(state[1 + i], AssignedCell):
                    state[1 + i] = mg.add(ctx, state[1 + i], v)
                else:
                    state[1 + i] = mg.add_with_const(ctx, v, state[1 + i])
            else:
                state[1 + i] = self._arc_cell(ctx, state[1 + i], v)
        if len(inputs) < spec.rate:
            idx = 1 + len(inputs)
            state[idx] = self._arc_cell(ctx, state[idx], 1) if not isinstance(state[idx], AssignedCell) else mg.add_with_const(ctx, state[idx], 1)

        half = spec.r_f // 2
        for r in range(spec.r_f + spec.r_p):
            is_full = not (half <= r < half + spec.r_p)
            state = self._round(ctx, state, r, is_full)
        return state

    def squeeze(self, ctx: RegionCtx) -> AssignedCell:
        """Run the sponge over the buffered inputs; output = state[1]
        (reference `poseidon_circuit.rs:385` + off-circuit `output`)."""
        spec = self.spec
        rate = spec.rate
        buf = list(self.buf)
        exact = len(buf) % rate == 0

        state: list = list(spec.initial_state)
        for i in range(0, len(buf), rate):
            state = self.permutation(ctx, state, buf[i : i + rate])
        if exact:
            state = self.permutation(ctx, state, [])
        return state[1]
