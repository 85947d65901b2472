"""Random-oracle construction helpers (ROTrait / ROPair analogue).

Reference `src/poseidon/random_oracle.rs` + defaults from `src/lib.rs:89-106`:
the main RO is Poseidon with T=5, RATE=4, R_F=10, R_P=10; challenges are
128-bit squeezes (`src/constants.rs`), pp-digests 250-bit.
"""

from __future__ import annotations

from ..fields.constants import FieldSpec
from ..ops.poseidon import PoseidonHash, poseidon_spec

# reference `src/constants.rs`
MAX_BITS = 255
NUM_HASH_BITS = 250
NUM_CHALLENGE_BITS = 128

# reference `src/lib.rs:89-106` (T/RATE) and `ivc/...` R_F=R_P=10
DEFAULT_T = 5
DEFAULT_RATE = 4
DEFAULT_R_F = 10
DEFAULT_R_P = 10


def default_ro(field: FieldSpec) -> PoseidonHash:
    """A fresh transcript RO over `field` with the reference's default spec."""
    return PoseidonHash(poseidon_spec(field, DEFAULT_T, DEFAULT_RATE, DEFAULT_R_F, DEFAULT_R_P))
