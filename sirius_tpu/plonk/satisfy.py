"""Satisfaction checks: row-parallel gate eval + log-derivative + commitments.

Replaces reference `PlonkStructure::is_sat*` (`src/plonk/mod.rs:304-396`) —
the same computation also serves as the MockProver-equivalent row checker
(SURVEY.md §4 item 4).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.commitment import CommitmentKey
from ..ops.poseidon import PoseidonHash
from .eval import PlonkEvalDomain
from .sps import sps_verify
from .structure import PlonkInstance, PlonkStructure, PlonkTrace, PlonkWitness


class IsSatError(Exception):
    pass


class EvaluationMismatch(IsSatError):
    def __init__(self, mismatch_count, total_row, rows=None):
        self.mismatch_count = mismatch_count
        self.rows = rows
        super().__init__(f"{mismatch_count}/{total_row} rows violate the compressed gate"
                         + (f" (first rows: {rows[:8]})" if rows else ""))


class LogDerivativeNotSat(IsSatError):
    pass


class CommitmentMismatch(IsSatError):
    pass


class PermCheckFail(IsSatError):
    pass


def eval_gate_mismatches(S: PlonkStructure, challenges: Sequence[int], W: PlonkWitness):
    """Evaluate the compressed gate on every row; returns bool (n,) violation
    mask (device)."""
    f = S.field
    dom = PlonkEvalDomain(
        S,
        challenges=[f.encode([c % f.p])[0] for c in challenges],
        W1s=list(W.W),
        W2s=[],
    )
    expr = S.custom_gates_lookup_compressed.compressed
    out = dom.evaluate_compiled([expr])[0]
    return ~f.is_zero(out)


def is_sat(
    S: PlonkStructure,
    ck: CommitmentKey,
    ro_nark: PoseidonHash,
    U: PlonkInstance,
    W: PlonkWitness,
    check_commit: bool = True,
) -> None:
    """Reference `is_sat` (`plonk/mod.rs:304-361`): sps_verify + per-row
    compressed gate + log-derivative sums + commitment re-check.

    check_commit=False lets the caller batch this trace's commitment
    openings with others in one RLC MSM (CommitmentKey.batched_commit_check).
    """
    sps_verify(U, ro_nark)

    mism = eval_gate_mismatches(S, U.challenges, W)
    count = int(mism.sum())
    if count:
        import numpy as np

        rows = np.nonzero(np.asarray(mism))[0].tolist()
        raise EvaluationMismatch(count, S.n, rows)

    if not is_sat_log_derivative(S, W):
        raise LogDerivativeNotSat()

    if check_commit:
        check = getattr(ck, "batched_commit_check", None)
        if check is not None:
            bad = check(list(zip(W.W, U.W_commitments)))
            if bad:
                raise CommitmentMismatch(f"rounds {bad}")
        else:
            for i, (Ci, Wi) in enumerate(zip(U.W_commitments, W.W)):
                if ck.commit_device(Wi) != Ci:
                    raise CommitmentMismatch(f"round {i}")


def is_sat_log_derivative(S: PlonkStructure, W: PlonkWitness) -> bool:
    """sum h == sum g per lookup (reference `plonk/mod.rs:366-396`)."""
    f = S.field
    n = S.n
    nl = S.num_lookups()
    if nl == 0:
        return True
    hg_round = W.W[2] if S.has_vector_lookup() else W.W[1]

    def sums():
        oks = []
        for li in range(nl):
            h = hg_round[(2 * li) * n : (2 * li + 1) * n]
            g = hg_round[(2 * li + 1) * n : (2 * li + 2) * n]
            diff = f.sub(f.sum_reduce(h), f.sum_reduce(g))
            oks.append(f.is_zero(diff))
        return jnp.stack(oks)

    return bool(jax.jit(sums)().all())


def is_sat_perm(S: PlonkStructure, U: PlonkInstance, W: PlonkWitness) -> None:
    """P @ Z == Z where Z = [instances | advice] (reference
    `nifs/sangria/mod.rs:385-453` non-relaxed specialization); device
    gather+compare."""
    from .permutation import device_perm_mismatches, perm_index_vector

    f = S.field
    n = S.n
    head = [v for inst in U.instances for v in inst]
    total = len(head) + n * S.num_advice_columns
    idx = perm_index_vector((id(S), "full"), S.permutation_matrix, total)
    bad = device_perm_mismatches(f, idx, head, W.W[0][: S.num_advice_columns * n])
    if bad:
        raise PermCheckFail(f"{bad}/{total} entries")
