"""Sharded-vs-single wall-clock sanity check on virtual CPU devices.

One real chip is reachable, so multi-chip speedups cannot be measured; the
Amdahl model in scripts/scaling_efficiency.py covers that.  What CAN be
measured without extra chips is the OVERHEAD the sharded program adds:
running the same jitted protocol programs (SPS witness fold + gate-leaf
sweep) on an 8-virtual-device mesh vs unsharded on the same host, the
collective/partitioning overhead is bounded if

    T_sharded <= bound_factor * T_single

(8 virtual devices oversubscribe the same cores, so T_sharded ≈ T_single
is the ideal; a collapse — involuntary rematerialization, pathological
collectives — shows up as a large factor).  Run with:

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/sharded_overhead_check.py

Emits one JSON line; appends to scripts/out/sharded_overhead.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_cpu_enable_async_dispatch", False)

import numpy as np

K = 14  # 16k rows x cols — big enough that per-op overhead is amortized
REPS = 5
BOUND_FACTOR = 2.0


def build_trace():
    from sirius_tpu.fields.constants import bn256_fr
    from sirius_tpu.frontend.runner import CircuitRunner
    from __graft_entry__ import _XorLookupFixture

    c = _XorLookupFixture(1, 2, 9)
    inst = c.instances()
    runner = CircuitRunner(K, bn256_fr, c, inst)
    S = runner.collect_plonk_structure()
    W = runner.collect_witness()
    return S, W, inst


def time_fold(S, W, mesh) -> float:
    """Time the row-parallel witness fold program (RelaxedPlonkWitness.fold)."""
    from sirius_tpu.nifs.sangria import RelaxedPlonkWitness
    from sirius_tpu.parallel.context import mesh_context
    from sirius_tpu.plonk.sps import _concat_with_padding
    from sirius_tpu.plonk.structure import PlonkWitness
    import contextlib

    f = S.field
    ctx = mesh_context(mesh) if mesh is not None else contextlib.nullcontext()
    with ctx:
        W1 = _concat_with_padding(f, W, S.n)
        w_rounds = [W1]
        relaxed = RelaxedPlonkWitness([W1], f.zeros((S.n,)))
        incoming = PlonkWitness([W1])
        ts = [f.zeros((S.n,))]
        relaxed.fold(f, incoming, ts, 0x1234)  # compile + warm
        best = float("inf")
        for _ in range(REPS):
            t0 = time.time()
            out = relaxed.fold(f, incoming, ts, 0x1234)
            jax.block_until_ready(out.W[0])
            best = min(best, time.time() - t0)
    return best


def main():
    from sirius_tpu.parallel.mesh import make_mesh

    n_dev = len(jax.devices())
    assert n_dev >= 8, f"need 8 virtual devices, got {n_dev} (set XLA_FLAGS)"
    S, W, inst = build_trace()

    t_single = time_fold(S, W, None)
    t_sharded = time_fold(S, W, make_mesh(8))
    factor = t_sharded / t_single
    rec = {
        "metric": "sharded_fold_overhead_factor",
        "k": K,
        "t_single_s": round(t_single, 4),
        "t_sharded_8dev_s": round(t_sharded, 4),
        "factor": round(factor, 3),
        "bound": BOUND_FACTOR,
        "ok": factor <= BOUND_FACTOR,
    }
    os.makedirs("scripts/out", exist_ok=True)
    with open("scripts/out/sharded_overhead.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    assert rec["ok"], rec


if __name__ == "__main__":
    main()
