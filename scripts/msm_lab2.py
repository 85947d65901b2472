"""Second MSM lab: rolled-CIOS merge kernel — compile time, exec time,
bit-exactness vs the unrolled merge.  SELF-CONTAINED kernel construction
(no library reload: the running batch's pallas_msm module predates the
roll_mul parameter, and reloading it would wipe its compiled-program
caches for the remaining stages)."""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp
import numpy as np


def _merge_call_variant(curve, WB: int, roll_mul: bool):
    """Clone of pallas_msm._merge_call/_merge_kernel with a KF constructed
    via the (new) roll_mul flag from limb_kernels (stateless module —
    importing fresh picks up the on-disk version without touching
    pallas_msm's caches)."""
    import importlib

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sirius_tpu.ops import limb_kernels as lk

    lk = importlib.reload(lk)
    from sirius_tpu.ops import pallas_msm as pm

    f = lk.KF(curve.fb, roll_mul=roll_mul)
    L, GROUPS, LANE = pm.L, pm.GROUPS, pm.LANE

    def kernel(x_ref, y_ref, z_ref, ox, oy, oz):
        cur = (x_ref[:], y_ref[:], z_ref[:])
        n_grp = GROUPS
        TAIL = 32
        while n_grp > TAIL:
            h = n_grp // 2
            lo = tuple(a[:, :h] for a in cur)
            hi = tuple(a[:, h:n_grp] for a in cur)
            cur = tuple(lk.k_add_complete(f, lo, hi))
            n_grp = h

        def tail_body(i, carry):
            shift = jnp.int32(TAIL) >> (i + 1)
            rolled = tuple(
                pltpu.roll(a, -shift, axis=1) if hasattr(pltpu, "roll")
                else jnp.roll(a, -shift, axis=1)
                for a in carry
            )
            return tuple(lk.k_add_complete(f, carry, rolled))

        cur = jax.lax.fori_loop(0, TAIL.bit_length() - 1, tail_body, cur)
        ox[:] = cur[0][:, :1]
        oy[:] = cur[1][:, :1]
        oz[:] = cur[2][:, :1]

    in_spec = pl.BlockSpec((L, GROUPS, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((L, 1, LANE), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(WB // LANE,),
        in_specs=[in_spec] * 3,
        out_specs=[out_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((L, 1, WB), jnp.uint32)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )


def run():
    from tpu_batch_r5 import emit, log
    from sirius_tpu.curves.jpoint import BN256_G1
    from sirius_tpu.ops import pallas_msm as pm

    c = 6
    W = pm._window_count(c)
    B = 1 << (c - 1)
    WB = W * B
    WBp = ((WB + pm.LANE - 1) // pm.LANE) * pm.LANE
    L = pm.L
    out = {"stage": "msm_lab2", "WBp": WBp}

    rng = np.random.default_rng(9)
    args = [
        jnp.asarray(rng.integers(0, 1 << 16, size=(L, pm.GROUPS, WBp), dtype=np.uint32))
        for _ in range(3)
    ]

    t0 = time.time()
    rolled = _merge_call_variant(BN256_G1, WBp, roll_mul=True)
    got = rolled(*args)
    jax.block_until_ready(got)
    out["rolled_compile_s"] = round(time.time() - t0, 1)
    log(f"msm_lab2: rolled merge compile+run {out['rolled_compile_s']}s")

    t0 = time.time()
    for _ in range(3):
        got = rolled(*args)
    jax.block_until_ready(got)
    out["rolled_exec_s"] = round((time.time() - t0) / 3, 4)

    # unrolled reference skipped on TPU (another ~580 s compile; rolled-vs-
    # unrolled bitexactness is interpret-verified in tests + this session,
    # and bench.py's gold spot-check covers the full commit path e2e)
    log(f"msm_lab2: rolled merge exec {out['rolled_exec_s']}s")
    emit(out)
