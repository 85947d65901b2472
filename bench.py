"""Benchmark driver: MSM throughput per chip (the #1 hot kernel, SURVEY.md §6).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: the reference (snarkify/sirius) runs halo2curves `best_multiexp`
on a 64-core EPYC 7702; published wall-clocks (BASELINE.md) imply roughly
1.5e6 points/s for 254-bit Pippenger MSM on that box.  vs_baseline is
value / 1.5e6 — >1.0 means faster than the reference's CPU MSM.

Run on the real TPU (default backend); falls back to a smaller size on CPU.
"""

from __future__ import annotations

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sirius_tpu_xla_cache_bench")

import jax.numpy as jnp
import numpy as np

BASELINE_MSM_POINTS_PER_SEC = 1.5e6


def build_points(curve, log_n: int):
    """points[i] = (i+1)*G via a doubling ladder (log_n broadcast adds)."""
    from sirius_tpu.curves.jpoint import Points
    from sirius_tpu.fields import gold

    g = gold.generator(curve.spec)
    arr = curve.encode([g])  # (1,)
    step = g
    for j in range(log_n):
        # arr_{j+1} = arr_j ++ (arr_j + 2^j * G)
        sp = curve.encode([step.mul(1 << j)])
        shifted = curve.add(arr, Points(*(jnp.broadcast_to(c, arr.x.shape) for c in sp)))
        arr = Points(*(jnp.concatenate([a, b]) for a, b in zip(arr, shifted)))
    return arr


def main():
    from sirius_tpu.curves.jpoint import BN256_G1, Points
    from sirius_tpu.fields import gold
    from sirius_tpu.fields.limb import ints_to_limbs
    from sirius_tpu.ops.msm import msm_jitted

    curve = BN256_G1
    backend = jax.default_backend()
    log_n = 16 if backend != "cpu" else 10
    window_bits = 8
    n = 1 << log_n

    points = build_points(curve, log_n)
    points.x.block_until_ready()

    rng = np.random.default_rng(42)
    scalars = [
        (int(a) | (int(b) << 63) | (int(c) << 126) | (int(d) << 189)) % curve.fs.p
        for a, b, c, d in rng.integers(0, 2**63, size=(n, 4))
    ]
    arr = jnp.asarray(ints_to_limbs(scalars))

    # correctness spot-check on a small prefix with the same kernel config
    m = 32
    small = msm_jitted(
        curve, arr[:m], Points(points.x[:m], points.y[:m], points.z[:m]), window_bits
    )
    got = curve.decode(Points(*(c[None] for c in small)))[0]
    want = gold.msm(scalars[:m], [gold.generator(curve.spec).mul(i + 1) for i in range(m)])
    assert got == want, "MSM kernel disagrees with gold model"

    # compile + warmup
    res = msm_jitted(curve, arr, points, window_bits)
    res.x.block_until_ready()
    # timed run
    t0 = time.time()
    res = msm_jitted(curve, arr, points, window_bits)
    res.x.block_until_ready()
    dt = time.time() - t0

    value = n / dt
    print(
        json.dumps(
            {
                "metric": f"msm_points_per_sec_2^{log_n}_{backend}_1chip",
                "value": round(value, 1),
                "unit": "points/s",
                "vs_baseline": round(value / BASELINE_MSM_POINTS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
