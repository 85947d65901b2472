"""TPU microbenchmark: Pallas madd throughput + raw field-mul ceiling.

Run from /root/repo (no PYTHONPATH): python scripts/tpu_microbench.py
Prints JSON lines; establishes the speed-of-light for the MSM rework.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

__import__("sirius_tpu.util.cache", fromlist=["setup_compile_cache"]).setup_compile_cache()

import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(fn, *args, iters=5):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    return (time.time() - t0) / iters


def main():
    from sirius_tpu.curves.jpoint import BN256_G1, Points
    from sirius_tpu.ops.pallas_madd import _F, _madd_call, L, LANE

    curve = BN256_G1
    f = _F(curve.fb)
    print(json.dumps({"backend": jax.default_backend()}), flush=True)

    rng = np.random.default_rng(0)

    # --- 1. madd throughput at large batch (chained x10 inside one jit)
    for S in (1024, 4096):
        n = S * LANE
        shape = (L, S, LANE)
        x = jnp.asarray(rng.integers(0, 1 << 16, size=shape, dtype=np.uint32))
        y = jnp.asarray(rng.integers(0, 1 << 16, size=shape, dtype=np.uint32))
        z = jnp.asarray(rng.integers(0, 1 << 16, size=shape, dtype=np.uint32))
        qx = jnp.asarray(rng.integers(0, 1 << 16, size=shape, dtype=np.uint32))
        qy = jnp.asarray(rng.integers(0, 1 << 16, size=shape, dtype=np.uint32))
        call = _madd_call(curve, S)

        REP = 8

        @jax.jit
        def chained(x, y, z, qx, qy):
            def body(i, c):
                cx, cy, cz = c
                return call(cx, cy, cz, qx, qy)
            return jax.lax.fori_loop(0, REP, body, (x, y, z))

        dt = bench(chained, x, y, z, qx, qy)
        rate = n * REP / dt
        print(json.dumps({"bench": f"pallas_madd_S{S}", "madds_per_sec": round(rate, 0),
                          "dt": round(dt, 4)}), flush=True)

    # --- 2. raw field mul ceiling: K chained muls per block in one kernel
    K = 8

    def mul_kernel(a_ref, b_ref, o_ref):
        a = [a_ref[i] for i in range(L)]
        b = [b_ref[i] for i in range(L)]
        for _ in range(K):
            a = f.mul(a, b)
        for i in range(L):
            o_ref[i] = a[i]

    for S in (1024,):
        blk = 8
        spec = pl.BlockSpec((L, blk, LANE), lambda s: (0, s, 0), memory_space=pltpu.VMEM)
        call2 = pl.pallas_call(
            mul_kernel,
            grid=(S // blk,),
            in_specs=[spec] * 2,
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((L, S, LANE), jnp.uint32),
        )
        n = S * LANE
        a = jnp.asarray(rng.integers(0, 1 << 16, size=(L, S, LANE), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 1 << 16, size=(L, S, LANE), dtype=np.uint32))
        jcall = jax.jit(lambda a, b: call2(a, b))
        dt = bench(jcall, a, b)
        rate = n * K / dt
        print(json.dumps({"bench": f"pallas_mul_chain_S{S}", "muls_per_sec": round(rate, 0),
                          "dt": round(dt, 4)}), flush=True)

    # --- 3. uint32 multiply vs add raw VPU rate
    def raw_kernel(op):
        def kern(a_ref, o_ref):
            a = a_ref[:]
            b = a
            for _ in range(64):
                b = op(b, a)
            o_ref[:] = b
        return kern

    for name, op in (("mul", lambda x, y: x * y), ("add", lambda x, y: x + y)):
        S = 512
        spec = pl.BlockSpec((8, LANE), lambda s: (s, 0), memory_space=pltpu.VMEM)
        callr = pl.pallas_call(
            raw_kernel(op),
            grid=(S // 8,),
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((S, LANE), jnp.uint32),
        )
        a = jnp.asarray(rng.integers(1, 1 << 16, size=(S, LANE), dtype=np.uint32))
        jcallr = jax.jit(lambda a: callr(a))
        dt = bench(jcallr, a, iters=20)
        rate = S * LANE * 64 / dt
        print(json.dumps({"bench": f"raw_u32_{name}", "ops_per_sec": round(rate, 0),
                          "dt": round(dt, 5)}), flush=True)


if __name__ == "__main__":
    main()
