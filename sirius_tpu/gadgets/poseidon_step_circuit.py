"""Poseidon-hash step circuit (reference `gadgets/poseidon_step_circuit.rs`:
the `TestPoseidonCircuit` used by benches and the CLI).

z_{i+1} = Poseidon(z_i, 0, 1, ..., repeat_count-1)
"""

from __future__ import annotations

from dataclasses import dataclass

from ..fields.constants import FieldSpec
from ..ops.poseidon import PoseidonHash, poseidon_spec
from ..util.ro import DEFAULT_R_F, DEFAULT_R_P, DEFAULT_RATE, DEFAULT_T
from .main_gate import MainGate, RegionCtx
from .poseidon_chip import PoseidonChip


@dataclass
class PoseidonStepCircuit:
    """arity-1 step circuit hashing the state with `repeat_count` constants."""

    field: FieldSpec
    repeat_count: int = 1
    arity: int = 1

    def _spec(self):
        return poseidon_spec(self.field, DEFAULT_T, DEFAULT_RATE, DEFAULT_R_F, DEFAULT_R_P)

    def configure(self, cs):
        return MainGate.configure(cs, T=5)

    def instances(self):
        return []

    def synthesize_step(self, config, ctx: RegionCtx, z_i):
        mg = MainGate(config, ctx.asn.p)
        chip = PoseidonChip(mg, self._spec())
        chip.absorb_cell(z_i[0])
        for i in range(self.repeat_count):
            chip.absorb_base(i)
        out = chip.squeeze(ctx)
        return [out]

    def process_step(self, z_i, k_table_size, spec):
        ro = PoseidonHash(self._spec())
        ro.absorb_field(z_i[0] % self.field.modulus)
        for i in range(self.repeat_count):
            ro.absorb_field(i)
        return [ro.squeeze(self.field.num_bits) % spec.modulus]
