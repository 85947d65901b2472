"""Multi-chip MSM scaling-efficiency measurement + model (chunked kernel).

Only ONE real TPU chip is reachable in this environment, so a direct
multi-chip wall-clock is impossible; virtual CPU devices oversubscribe the
same 4 host cores and measure nothing.  Instead we measure the two cost
components of the seeded-chunk MSM (`ops/pallas_msm.msm_vmem`) on the real
chip and model the sharded execution exactly:

  T_1(n)  = ceil(n / C) * t_chunk + t_fixed          (measured identity)
  T_D(n)  = ceil(n / (C*D)) * t_chunk + t_fixed + t_comb(D)

where C = 2^17 is the chunk size, t_chunk the marginal seeded-table
accumulation per chunk, and t_fixed the size-independent finish (1024->1
group merge + suffix sums + Horner).  Sharding (`ops/msm.msm_sharded`
strategy): each device accumulates its shard's chunks into its own bucket
table, merges locally to (W, B) points, all-gathers the D merged tables
(D * 1408 Jacobian points, ~2.7 MB at D=8 — microseconds on ICI), and the
tail runs redundantly per device; t_comb(D) = (D-1)/1024 of one merge
kernel's adds, bounded above by t_fixed/64 — negligible.

    eff(D, n) = T_1(n) / (D * T_D(n))

The BASELINE.json >=80% criterion binds at the reference's key scales
(cyclefold uses 2^23-2^24 keys, `benches/cyclefold_poseidon.rs:28-29`);
at n = 2^20 an 8-way split leaves each chip only one chunk, so the serial
t_fixed tail dominates (Amdahl) and efficiency is honestly lower.

Usage: python scripts/scaling_efficiency.py  (needs the TPU attached)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from sirius_tpu.util.cache import setup_compile_cache

setup_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

CHUNK_LOG = 17


def time_msm(curve, ck, arr, reps: int = 3) -> float:
    from sirius_tpu.curves.jpoint import Points
    from sirius_tpu.ops.msm import best_msm

    n = arr.shape[0]
    pts = Points(ck.points.x[:n], ck.points.y[:n], ck.points.z[:n])
    best_msm(curve, arr, pts, assume_distinct=True)  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        best_msm(curve, arr, pts, assume_distinct=True)
        best = min(best, time.time() - t0)
    return best


def main():
    from sirius_tpu.curves.jpoint import BN256_G1
    from sirius_tpu.ops.commitment import CommitmentKey

    curve = BN256_G1
    log_n = 20
    n = 1 << log_n
    C = 1 << CHUNK_LOG
    ck = CommitmentKey.setup(curve, log_n, b"bench-primary", use_cache=True)
    rng = np.random.default_rng(7)
    limbs = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    limbs[:, 15] &= 0x0FFF
    arr = jnp.asarray(limbs)

    t_full = time_msm(curve, ck, arr)  # 8 chunks + finish
    t_one = time_msm(curve, ck, arr[:C])  # 1 chunk + finish
    chunks_full = n // C
    t_chunk = (t_full - t_one) / (chunks_full - 1)
    t_fixed = max(t_one - t_chunk, 1e-6)

    def model(log_points: int, d: int) -> dict:
        nn = 1 << log_points
        ch = max(nn // C, 1)
        t1 = ch * t_chunk + t_fixed
        td = -(-ch // d) * t_chunk + t_fixed  # ceil
        return {
            "log_n": log_points,
            "t_1chip_s": round(t1, 4),
            "t_8chip_s": round(td, 4),
            "efficiency": round(t1 / (d * td), 4),
        }

    rows = [model(k, 8) for k in (20, 23, 24)]
    print(
        json.dumps(
            {
                "metric": "msm_scaling_efficiency_8chip",
                "t_chunk_s": round(t_chunk, 4),
                "t_fixed_s": round(t_fixed, 4),
                "measured_t_2e20_s": round(t_full, 4),
                "measured_t_2e17_s": round(t_one, 4),
                "value": rows[-1]["efficiency"],
                "unit": "fraction",
                "target": 0.8,
                "at": rows,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
