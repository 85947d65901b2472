"""Benchmark driver: MSM/commit throughput (the #1 hot kernel, SURVEY.md §6).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The workload is a Pedersen commitment over a cached commitment key — the
exact hot path of the reference's `CommitmentKey::commit` -> `best_multiexp`
(`src/commitment.rs:81-90`).  The framework has two MSM backends and the
headline number is the better of the two on this machine (both sub-values
are reported alongside):
  - tpu:    XLA windowed bucket kernel (ops/msm.py), one chip
  - native: C++ multi-threaded Pippenger (sirius_tpu/native), host CPUs —
            the architectural analogue of the reference's rayon Pippenger

vs_baseline: the reference runs halo2curves Pippenger on a 64-core EPYC 7702;
its published wall-clocks (BASELINE.md) imply roughly 1.5e6 points/s for
254-bit MSM on that box.  vs_baseline = value / 1.5e6.
"""

from __future__ import annotations

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/sirius_tpu_xla_cache_bench")

import jax.numpy as jnp
import numpy as np

BASELINE_MSM_POINTS_PER_SEC = 1.5e6


def main():
    from sirius_tpu import native
    from sirius_tpu.curves.jpoint import BN256_G1, Points
    from sirius_tpu.fields import gold
    from sirius_tpu.fields.limb import ints_to_limbs
    from sirius_tpu.ops.commitment import CommitmentKey
    from sirius_tpu.ops.msm import best_msm, msm_host

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

    # --- tpu/XLA backend (best_msm: one-hot bucket kernel at this size):
    # compile + warmup, then timed run
    got_full = best_msm(curve, arr, ck.points, assume_distinct=True)
    t0 = time.time()
    got_full2 = best_msm(curve, arr, ck.points, assume_distinct=True)
    dt = time.time() - t0
    assert (got_full2.x, got_full2.y) == (got_full.x, got_full.y)
    tpu_pts_per_sec = n / dt

    # --- native C++ backend (threaded Pippenger on the host CPUs)
    native_pts_per_sec = 0.0
    if native.available():
        host_pts = ck.host_points()
        nat_small = native.native_msm(curve.spec, host_pts[:m], scalars[:m])
        assert (nat_small.x, nat_small.y) == (want.x, want.y), (
            "native MSM disagrees with gold model"
        )
        native.native_msm(curve.spec, host_pts, scalars)  # warm (thread pool, caches)
        t0 = time.time()
        native.native_msm(curve.spec, host_pts, scalars)
        dt_native = time.time() - t0
        native_pts_per_sec = n / dt_native

    # --- secondary metric: radix-2 NTT throughput (SURVEY §6 target)
    ntt_elems_per_sec = 0.0
    try:
        from sirius_tpu.fields.jfield import FR
        from sirius_tpu.ops.ntt import NTT

        ntt = NTT(FR, log_n)
        coeffs = FR.encode([int(x) for x in rng.integers(0, 2**62, size=n)])
        ntt.fft(coeffs).block_until_ready()  # compile + warm
        t0 = time.time()
        ntt.fft(coeffs).block_until_ready()
        ntt_elems_per_sec = n / (time.time() - t0)
    except Exception:
        pass  # NTT metric is best-effort; the headline stays commit MSM

    value = max(tpu_pts_per_sec, native_pts_per_sec)
    best = "native" if native_pts_per_sec > tpu_pts_per_sec else backend
    print(
        json.dumps(
            {
                "metric": f"commit_msm_points_per_sec_2^{log_n}",
                "value": round(value, 1),
                "unit": "points/s",
                "vs_baseline": round(value / BASELINE_MSM_POINTS_PER_SEC, 4),
                "backend": best,
                "tpu_points_per_sec": round(tpu_pts_per_sec, 1),
                "native_points_per_sec": round(native_pts_per_sec, 1),
                "native_threads": min(os.cpu_count() or 1, 16),
                "ntt_elems_per_sec": round(ntt_elems_per_sec, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
