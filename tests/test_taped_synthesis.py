"""Taped synthesis: replayed witnesses must equal direct synthesis exactly.

Differential check on the cyclefold SFC + support circuit at a small k:
build public params twice (tape on / off), run two IVC steps each way, and
compare every advice column bit-for-bit plus the resulting markers.
"""

import os

import numpy as np
import pytest

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from sirius_tpu.curves.jpoint import BN256_G1, GRUMPKIN
from sirius_tpu.ivc.cyclefold_ivc import (
    SUPPORT_K,
    CyclefoldIVC,
    CyclefoldPublicParams,
    _cf_flatten,
    _cf_pack,
)
from sirius_tpu.ivc.step_circuit import TrivialStepCircuit
from sirius_tpu.util.testing import MockCommitmentKey

K = 17  # smallest k the SFC fits


def _mk_pp(tape: bool) -> CyclefoldPublicParams:
    os.environ["SIRIUS_TPU_TAPE"] = "1" if tape else "0"
    try:
        return CyclefoldPublicParams(
            TrivialStepCircuit(arity=1),
            k=K,
            ck_primary=MockCommitmentKey(BN256_G1),
            ck_support=MockCommitmentKey(GRUMPKIN),
        )
    finally:
        os.environ.pop("SIRIUS_TPU_TAPE", None)


def test_replay_matches_direct_synthesis():
    if not os.environ.get("SIRIUS_TPU_SLOW_TESTS"):
        pytest.skip("set SIRIUS_TPU_SLOW_TESTS=1 (few minutes on CPU)")
    pp_t = _mk_pp(tape=True)
    pp_d = _mk_pp(tape=False)
    assert pp_t.digest_hex() == pp_d.digest_hex(), "tape changed the structure"

    ivc_t = CyclefoldIVC(pp_t, [0x42])
    ivc_d = CyclefoldIVC(pp_d, [0x42])

    def check_step():
        u_t, u_d = ivc_t.primary_trace.u, ivc_d.primary_trace.u
        assert u_t.instances == u_d.instances
        assert u_t.challenges == u_d.challenges
        for a, b in zip(ivc_t.primary_trace.w.W, ivc_d.primary_trace.w.W):
            assert np.array_equal(np.asarray(a), np.asarray(b)), "witness differs"

    check_step()
    ivc_t.next()
    ivc_d.next()
    check_step()
    assert ivc_t.z_i == ivc_d.z_i
    assert not ivc_t.verify()


def test_flatten_wrap_order_is_stable():
    """_cf_flatten and the tracer share _cf_pack, so leaf counts agree."""
    os.environ["SIRIUS_TPU_TAPE"] = "0"
    try:
        pp = CyclefoldPublicParams(
            TrivialStepCircuit(arity=1),
            k=K,
            ck_primary=MockCommitmentKey(BN256_G1),
            ck_support=MockCommitmentKey(GRUMPKIN),
        )
    finally:
        os.environ.pop("SIRIUS_TPU_TAPE", None)
    flat = _cf_flatten(pp._dry_inputs())
    count = [0]

    def P(v):
        count[0] += 1
        return v

    _cf_pack(pp._dry_inputs(), P)
    assert len(flat) == count[0] > 0
