"""Benchmark driver: MSM throughput per chip (the #1 hot kernel, SURVEY.md §6).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The workload is a Pedersen commitment over a cached commitment key — the
exact hot path of the reference's `CommitmentKey::commit` -> `best_multiexp`
(`src/commitment.rs:81-90`).

vs_baseline: the reference runs halo2curves Pippenger on a 64-core EPYC 7702;
its published wall-clocks (BASELINE.md) imply roughly 1.5e6 points/s for
254-bit MSM on that box.  vs_baseline = value / 1.5e6.
"""

from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sirius_tpu_xla_cache_bench")

import jax.numpy as jnp
import numpy as np

BASELINE_MSM_POINTS_PER_SEC = 1.5e6


def main():
    from sirius_tpu.curves.jpoint import BN256_G1, Points
    from sirius_tpu.fields import gold
    from sirius_tpu.fields.limb import ints_to_limbs
    from sirius_tpu.ops.commitment import CommitmentKey
    from sirius_tpu.ops.msm import msm_host

    curve = BN256_G1
    backend = jax.default_backend()
    log_n = 16 if backend != "cpu" else 10
    window_bits = 8
    n = 1 << log_n

    ck = CommitmentKey.setup(curve, log_n, b"bench", use_cache=True, window_bits=window_bits)

    rng = np.random.default_rng(42)
    scalars = [
        (int(a) | (int(b) << 63) | (int(c) << 126) | (int(d) << 189)) % curve.fs.p
        for a, b, c, d in rng.integers(0, 2**63, size=(n, 4))
    ]
    arr = jnp.asarray(ints_to_limbs(scalars))

    # correctness spot-check on a small prefix with the same kernel config
    m = 32
    got = msm_host(
        curve, arr[:m], Points(ck.points.x[:m], ck.points.y[:m], ck.points.z[:m]), window_bits
    )
    prefix_pts = curve.decode(Points(ck.points.x[:m], ck.points.y[:m], ck.points.z[:m]))
    want = gold.msm(scalars[:m], prefix_pts)
    assert got == want, "MSM kernel disagrees with gold model"

    # compile + warmup
    msm_host(curve, arr, ck.points, window_bits)
    # timed run
    t0 = time.time()
    msm_host(curve, arr, ck.points, window_bits)
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
