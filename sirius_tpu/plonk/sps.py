"""Special-soundness protocol: witness commitment rounds + challenge schedule.

Replaces reference `src/plonk/mod.rs:402-663` (SPS prover) and `src/sps.rs`
(verifier).  Round count = num_challenges (0..3):

  0: single gate, no lookup:       commit(advice)
  1: multiple gates, no lookup:    [instances] [C1] ]r1[
  2: lookup, no vector lookup:     [instances] [C1] ]r1[ [C2] ]r2[
  3: vector lookup:                [instances] [C1] ]r1[ [C2] ]r2[ [C3] ]r3[

The RO lives on the host (transcript is the global sequencer, SURVEY.md §5);
commitments and row-sweeps run on device between squeezes.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from ..fields.jfield import Field
from ..ops.commitment import CommitmentKey
from ..ops.poseidon import PoseidonHash
from ..util.ro import NUM_CHALLENGE_BITS
from .structure import PlonkInstance, PlonkStructure, PlonkTrace, PlonkWitness


class SpsError(Exception):
    pass


class ChallengeNotMatch(SpsError):
    def __init__(self, index):
        super().__init__(f"sps challenge mismatch at {index}")


def _absorb_instances(ro: PoseidonHash, instances: Sequence[Sequence[int]]):
    for inst in instances:
        for v in inst:
            ro.absorb_field(v)


def _concat_with_padding(f: Field, cols: Sequence[Sequence[int]], n: int) -> jnp.ndarray:
    """Column-major concatenation, each column padded to n rows, as a
    (len(cols)*n, L) Montgomery device array (reference
    `concatenate_with_padding`).  Under an active mesh the result is placed
    row-sharded so downstream row sweeps inherit the sharding (GSPMD)."""
    from ..frontend.taped import ReplayedWitness

    if isinstance(cols, ReplayedWitness):
        # tape-replay fast path: columns are (n, 8) packed standard-form
        # words — halves the host->device transfer vs 16-bit limb arrays,
        # unpacked + to_mont in one device program
        import numpy as np

        if not len(cols):
            return f.zeros((0,))
        arr = np.concatenate(cols.cols, axis=0)
        assert arr.shape[0] == len(cols) * n
        out = f.to_mont_words(jnp.asarray(arr))
    else:
        flat: list[int] = []
        for col in cols:
            flat.extend(col)
            flat.extend([0] * (n - len(col)))
        if not flat:
            return f.zeros((0,))
        out = f.encode(flat)
    from ..parallel.context import get_mesh

    mesh = get_mesh()
    if mesh is not None and out.shape[0] % mesh.devices.size == 0:
        from ..parallel.mesh import shard_rows

        out = shard_rows(mesh, out, axis=0)
    return out


def run_sps_protocol(
    S: PlonkStructure,
    ck: CommitmentKey,
    instances: Sequence[Sequence[int]],
    advice: Sequence[Sequence[int]],
    ro_nark: PoseidonHash,
) -> PlonkTrace:
    """Generate the PlonkTrace (reference `run_sps_protocol`,
    `plonk/mod.rs:413-428`)."""
    f = S.field
    n = S.n
    nc = S.num_challenges

    if nc == 0:
        W1 = _concat_with_padding(f, advice, n)
        C1 = ck.commit_device(W1)
        return PlonkTrace(
            PlonkInstance([C1], [list(i) for i in instances], []),
            PlonkWitness([W1]),
        )

    if nc == 1:
        from ..util.profiling import span

        with span("sps_concat"):
            W1 = _concat_with_padding(f, advice, n)
        with span("sps_commit"):
            C1 = ck.commit_device(W1)
        with span("sps_transcript"):
            _absorb_instances(ro_nark, instances)
            ro_nark.absorb_point(C1)
            r1 = ro_nark.squeeze(NUM_CHALLENGE_BITS)
        return PlonkTrace(
            PlonkInstance([C1], [list(i) for i in instances], [r1]),
            PlonkWitness([W1]),
        )

    la = S.lookup_arguments
    if la is None:
        raise SpsError("lookup arguments required for >=2 challenges")

    if nc == 2:
        c1 = la.evaluate_coefficient_1(S, list(advice), 0)
        W1 = jnp.concatenate(
            [
                _concat_with_padding(f, advice, n),
                _concat_with_padding(f, c1.ls + c1.ts + c1.ms, n),
            ]
        )
        C1 = ck.commit_device(W1)
        _absorb_instances(ro_nark, instances)
        ro_nark.absorb_point(C1)
        r1 = ro_nark.squeeze(NUM_CHALLENGE_BITS)
        c2 = c1.evaluate_coefficient_2(r1)
        W2 = _concat_with_padding(f, c2.hs + c2.gs, n)
        C2 = ck.commit_device(W2)
        ro_nark.absorb_point(C2)
        r2 = ro_nark.squeeze(NUM_CHALLENGE_BITS)
        return PlonkTrace(
            PlonkInstance([C1, C2], [list(i) for i in instances], [r1, r2]),
            PlonkWitness([W1, W2]),
        )

    if nc == 3:
        _absorb_instances(ro_nark, instances)
        W1 = _concat_with_padding(f, advice, n)
        C1 = ck.commit_device(W1)
        ro_nark.absorb_point(C1)
        r1 = ro_nark.squeeze(NUM_CHALLENGE_BITS)
        c1 = la.evaluate_coefficient_1(S, list(advice), r1)
        W2 = _concat_with_padding(f, c1.ls + c1.ts + c1.ms, n)
        C2 = ck.commit_device(W2)
        ro_nark.absorb_point(C2)
        r2 = ro_nark.squeeze(NUM_CHALLENGE_BITS)
        c2 = c1.evaluate_coefficient_2(r2)
        W3 = _concat_with_padding(f, c2.hs + c2.gs, n)
        C3 = ck.commit_device(W3)
        ro_nark.absorb_point(C3)
        r3 = ro_nark.squeeze(NUM_CHALLENGE_BITS)
        return PlonkTrace(
            PlonkInstance([C1, C2, C3], [list(i) for i in instances], [r1, r2, r3]),
            PlonkWitness([W1, W2, W3]),
        )

    raise SpsError(f"unsupported challenge count {nc}")


def dry_run_sps_protocol(S: PlonkStructure, curve_spec) -> PlonkTrace:
    """All-zero trace with the right shape (reference `dry_run_sps_protocol`)."""
    from ..fields import gold

    return PlonkTrace(
        PlonkInstance(
            [gold.identity(curve_spec)] * len(S.round_sizes),
            [[0] * io for io in S.num_io],
            [0] * S.num_challenges,
        ),
        PlonkWitness.zeros(S.field, S.round_sizes),
    )


def sps_verify(U: PlonkInstance, ro_nark: PoseidonHash) -> None:
    """Re-derive challenges and compare (reference `src/sps.rs:32-64`)."""
    if not U.challenges:
        return
    _absorb_instances(ro_nark, U.instances)
    for i, expected in enumerate(U.challenges):
        ro_nark.absorb_point(U.W_commitments[i])
        got = ro_nark.squeeze(NUM_CHALLENGE_BITS)
        if got != expected:
            raise ChallengeNotMatch(i)
