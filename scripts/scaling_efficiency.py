"""Multi-chip MSM scaling-efficiency estimate from single-chip measurements.

Only ONE real TPU chip is reachable in this environment, so a direct
multi-chip wall-clock is impossible; virtual CPU devices oversubscribe the
same 4 host cores and measure nothing.  The sharded MSM
(`ops/msm.py::msm_sharded`) is embarrassingly parallel — each device runs
the identical bucket-table kernel on n/D points, and the only cross-device
work is combining D*W tiny Jacobian window totals on the host (W = 43
windows at c=6, i.e. ~344 points for D=8 — microseconds).

So the projected D-chip efficiency is a pure single-chip quantity:

    eff(D) = T(n) / (D * T(n/D))

with T measured on the real chip.  eff(D) < 1 exactly to the extent the
kernel has a size-independent tail (group merge tree + Horner) that each
chip pays on its smaller shard.  This script measures T at 2^20 and 2^17
on the attached TPU and prints eff(8), the BASELINE.json >=80% criterion's
honest analogue (the analytical transfer term for 2 hosts over DCN is
D*W points ~ 22 KiB — negligible).

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


def time_msm(curve, ck, arr, reps: int = 3) -> float:
    from sirius_tpu.ops.msm import best_msm

    n = arr.shape[0]
    from sirius_tpu.curves.jpoint import Points

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
    from sirius_tpu.fields.limb import ints_to_limbs
    from sirius_tpu.ops.commitment import CommitmentKey

    curve = BN256_G1
    log_n = 20
    d = 8
    n = 1 << log_n
    ck = CommitmentKey.setup(curve, log_n, b"bench", use_cache=True)
    rng = np.random.default_rng(7)
    scalars = [
        (int(a) | (int(b) << 63) | (int(c) << 126) | (int(d_) << 189)) % curve.fs.p
        for a, b, c, d_ in rng.integers(0, 2**63, size=(n, 4))
    ]
    arr = jnp.asarray(ints_to_limbs(scalars))

    t_full = time_msm(curve, ck, arr)
    t_shard = time_msm(curve, ck, arr[: n // d])
    eff = t_full / (d * t_shard)
    print(
        json.dumps(
            {
                "metric": "msm_scaling_efficiency_projected_8chip",
                "t_2e20_s": round(t_full, 4),
                "t_2e17_s": round(t_shard, 4),
                "value": round(eff, 4),
                "unit": "fraction",
                "target": 0.8,
                "device": str(jax.devices()[0]),
                "note": "eff(8)=T(2^20)/(8*T(2^17)) on one real chip; "
                "sharded path is embarrassingly parallel, combine is D*43 "
                "Jacobian points on host",
            }
        )
    )


if __name__ == "__main__":
    main()
