"""Seeded chunked VMEM-table MSM vs the gold model (interpret mode on CPU).

The production TPU path (`ops/pallas_msm.msm_vmem`) processes every
commitment in fixed-size chunks whose raw bucket tables thread through HBM
as the next chunk's seed; these tests run the same code in Pallas interpret
mode to pin the chunk/seed/pad algebra.  Gated: one interpret-mode MSM at
this size is minutes of numpy (the merge kernel emulates 1023 complete adds
on (16, 1024, 128) slabs per lane block).  TPU-side validation is in
bench.py's gold spot-check, which runs on every bench invocation.
"""

import os

import numpy as np
import pytest

if not os.environ.get("SIRIUS_TPU_SLOW_TESTS"):
    pytest.skip(
        "interpret-mode chunked MSM takes minutes on CPU; set "
        "SIRIUS_TPU_SLOW_TESTS=1 to run",
        allow_module_level=True,
    )

import jax.numpy as jnp

from sirius_tpu.curves.jpoint import BN256_G1, Points
from sirius_tpu.fields import gold
from sirius_tpu.ops.commitment import CommitmentKey
from sirius_tpu.ops.pallas_msm import msm_vmem


def test_chunked_msm_seeded_tables_vs_gold():
    ck = CommitmentKey.setup(BN256_G1, 11, b"chunktest", use_cache=False)
    n = 2048
    rng = np.random.default_rng(1)
    limbs = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    limbs[:, 15] &= 0x0FFF
    scal = jnp.asarray(limbs)
    ints = [sum(int(v) << (16 * i) for i, v in enumerate(r)) for r in limbs]

    # two full chunks through the seeded-table path
    got = msm_vmem(
        BN256_G1, scal, ck.points, step_block=1, interpret=True, chunk=1024
    )
    want = gold.msm(ints, ck.host_points())
    assert got == want

    # padded tail: n=1536 -> one full chunk + a zero-padded half chunk
    got2 = msm_vmem(
        BN256_G1,
        scal[:1536],
        Points(ck.points.x[:1536], ck.points.y[:1536], ck.points.z[:1536]),
        step_block=1,
        interpret=True,
        chunk=1024,
    )
    want2 = gold.msm(ints[:1536], ck.host_points()[:1536])
    assert got2 == want2
