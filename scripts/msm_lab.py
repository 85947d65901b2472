"""MSM finish-compile lab (runs inside the batch's claim via lab=msm_lab:run):
1. Time the merge pallas kernel compile alone vs the full finish program
   (attribution: Mosaic merge vs unrolled XLA fori tails).
2. Compile a dynamic-bound finish variant and time it.
"""
import importlib
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp
import numpy as np


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
    out = {"stage": "msm_lab", "c": c}

    # NOTE: _merge_call/_finish_jit are lru-cached and may already be
    # compiled in this process — use a FRESH variant key where needed.
    # 1. merge alone at a fresh (different) WBp padding to force recompile
    WBp2 = WBp + pm.LANE
    t0 = time.time()
    merge = pm._merge_call(BN256_G1, WBp2)
    r = merge(*[jnp.zeros((L, pm.GROUPS, WBp2), jnp.uint32)] * 3)
    jax.block_until_ready(r)
    out["merge_only_compile_s"] = round(time.time() - t0, 1)
    log(f"msm_lab: merge-only compile+run {out['merge_only_compile_s']}s")

    # 2. dynamic-bound finish variant: same tail with runtime loop bounds
    from functools import partial
    from sirius_tpu.curves.jpoint import Points
    from sirius_tpu.ops.msm import _roll_fill

    curve = BN256_G1

    def run_fin(wreal_dyn, bsteps_dyn, otx, oty, otz):
        def to_flat(a):
            flat = jnp.transpose(a, (1, 3, 4, 0, 2)).reshape(L, pm.GROUPS, WB)
            if WBp != WB:
                flat = jnp.pad(flat, ((0, 0), (0, 0), (0, WBp - WB)))
            return flat

        mx, my, mz = pm._merge_call(curve, WBp)(to_flat(otx), to_flat(oty), to_flat(otz))

        def to_pts(a):
            return jnp.transpose(a[:, 0, :WB], (1, 0)).reshape(W, B, L)

        buckets = Points(to_pts(mx), to_pts(my), to_pts(mz))
        identWB = curve.identity((W, B))

        def suf_body(j, Pc):
            shift = jnp.int32(1) << j
            Pnext = _roll_fill(Pc, identWB, shift, axis=1, forward=False)
            return curve.add(Pc, Pnext)

        suffix = jax.lax.fori_loop(0, bsteps_dyn, suf_body, buckets)
        total_scan = jax.lax.fori_loop(0, bsteps_dyn, suf_body, suffix)
        totals = Points(total_scan.x[:, 0], total_scan.y[:, 0], total_scan.z[:, 0])

        def at(i):
            return Points(*(jax.lax.dynamic_index_in_dim(tc, i, keepdims=False) for tc in totals))

        def horner(i, acc):
            w = W - 2 - i
            for _ in range(c):
                acc = curve.dbl(acc)
            return curve.add(acc, at(w))

        acc = jax.lax.fori_loop(0, wreal_dyn, horner, at(W - 1))
        fm = curve.fb.from_mont
        return jnp.stack([fm(acc.x), fm(acc.y), fm(acc.z)])

    fin_dyn = jax.jit(run_fin)
    tbl = [jnp.zeros((W, L, B, pm.SUBL, pm.LANE), jnp.uint32)] * 3
    bsteps = max((B - 1).bit_length(), 1)
    t0 = time.time()
    o = fin_dyn(jnp.int32(W - 1), jnp.int32(bsteps), *tbl)
    jax.block_until_ready(o)
    out["finish_dynbound_compile_s"] = round(time.time() - t0, 1)
    log(f"msm_lab: dynamic-bound finish compile+run {out['finish_dynbound_compile_s']}s")

    # 3. exec-time check of the dynamic variant (warm)
    t0 = time.time()
    o = fin_dyn(jnp.int32(W - 1), jnp.int32(bsteps), *tbl)
    jax.block_until_ready(o)
    out["finish_dynbound_exec_s"] = round(time.time() - t0, 3)

    # 4. correctness: dynamic variant == static finish on a random table
    rng = np.random.default_rng(5)
    tbl2 = [jnp.asarray(rng.integers(0, 1 << 16, size=(W, L, B, pm.SUBL, pm.LANE), dtype=np.uint32)) for _ in range(3)]
    # static finish is already compiled in-process (the IVC stages used it)
    want = pm._finish_jit(BN256_G1, c)(*tbl2)
    got = fin_dyn(jnp.int32(W - 1), jnp.int32(bsteps), *tbl2)
    out["dynbound_bitexact"] = bool(jnp.array_equal(got, want))
    log(f"msm_lab: dyn==static bitexact={out['dynbound_bitexact']} exec {out['finish_dynbound_exec_s']}s")
    emit(out)
