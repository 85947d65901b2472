"""Round-4 TPU batch: every TPU-bound deliverable in ONE process.

The axon TPU tunnel admits one client session at a time and a dead
session's claim takes ~25 min to expire server-side, so sequential
separate-process runs waste half an hour each on claim waits.  This
driver runs all requested stages inside one process / one claim:

  poseidon   BASELINE poseidon row (pp/new/next/verify, real keys)
  sha256     BASELINE sha256 row (H=16/k=18 spread-table step)
  merkle     merkle batch 1..5 sweep vs docs/cyclefold_report.md:205-209
  longfold   N cyclefold steps through checkpoint/resume (north star)

Usage:  python scripts/tpu_batch_r4.py poseidon merkle longfold
Every stage appends a JSON line to scripts/out/tpu_batch_r4.jsonl and
prints it; stages are independent (a failure skips to the next).
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OUT = "scripts/out/tpu_batch_r4.jsonl"
_T0 = time.time()


def log(msg):
    print(f"[tpu_batch +{time.time() - _T0:8.1f}s] {msg}", file=sys.stderr, flush=True)


def emit(rec: dict):
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _keys(ivc_k: int, wide: bool = False):
    """wide=True for gate-adding step circuits (poseidon/sha256/merkle):
    their SFCs commit ~14 columns, overflowing an ivc_k+3 key."""
    from sirius_tpu.curves.jpoint import BN256_G1, GRUMPKIN
    from sirius_tpu.ivc.cyclefold_ivc import SUPPORT_K
    from sirius_tpu.ops.commitment import CommitmentKey

    key_k = max(ivc_k + (4 if wide else 3), 20)
    ck1 = CommitmentKey.setup(BN256_G1, key_k, b"bench-primary", use_cache=True)
    ck2 = CommitmentKey.setup(GRUMPKIN, SUPPORT_K + 3, b"bench-support", use_cache=True)
    return ck1, ck2


def stage_trivial():
    import bench

    ck1, ck2 = _keys(17)
    out: dict = {"stage": "trivial_ivc", "k": 17}
    bench.bench_cyclefold_ivc(17, ck1, ck2, out, "trivial", prefix="ivc")
    b = bench.BASELINES["trivial"]
    out["vs_baseline_next"] = round(b["next"] / out["ivc_next_s"], 3)
    out["vs_baseline_new"] = round(b["new"] / out["ivc_new_s"], 3)
    out["vs_baseline_verify"] = round(b["verify"] / out["ivc_verify_s"], 3)
    emit(out)


def stage_ntt():
    import bench

    out = {"stage": "ntt", "log_n": 20}
    out["elems_per_sec"] = round(bench.bench_ntt(20), 1)
    emit(out)


def stage_msm():
    import bench

    ck1, _ = _keys(17)
    out = {"stage": "msm", "log_n": 20}
    out["points_per_sec"] = round(bench.bench_msm(bench_curve(), 20, ck1), 1)
    emit(out)


def bench_curve():
    from sirius_tpu.curves.jpoint import BN256_G1

    return BN256_G1


def stage_poseidon():
    import bench

    ck1, ck2 = _keys(17, wide=True)
    out: dict = {"stage": "poseidon_ivc", "k": 17}
    bench.bench_cyclefold_ivc(17, ck1, ck2, out, "poseidon", prefix="ivc")
    b = bench.BASELINES["poseidon"]
    out["vs_baseline_next"] = round(b["next"] / out["ivc_next_s"], 3)
    out["vs_baseline_new"] = round(b["new"] / out["ivc_new_s"], 3)
    out["vs_baseline_verify"] = round(b["verify"] / out["ivc_verify_s"], 3)
    emit(out)


def stage_sha256():
    import bench

    ck1, ck2 = _keys(18, wide=True)
    out: dict = {"stage": "sha256_ivc", "k": 18}
    bench.bench_cyclefold_ivc(18, ck1, ck2, out, "sha256", prefix="ivc")
    b = bench.BASELINES["sha256"]
    out["vs_baseline_next"] = round(b["next"] / out["ivc_next_s"], 3)
    out["vs_baseline_new"] = round(b["new"] / out["ivc_new_s"], 3)
    out["vs_baseline_verify"] = round(b["verify"] / out["ivc_verify_s"], 3)
    emit(out)


def stage_merkle(max_batch: int = 5):
    from sirius_tpu.fields.constants import bn256_fr
    from sirius_tpu.gadgets.merkle_step_circuit import MerkleStepCircuit
    from sirius_tpu.ivc.cyclefold_ivc import CyclefoldIVC, CyclefoldPublicParams

    BASELINE = {
        1: (24.7, 16.4, 3.98),
        2: (30.0, 19.5, 3.97),
        3: (35.7, 22.4, 4.01),
        4: (41.7, 25.7, 4.19),
        5: (47.8, 28.7, 4.35),
    }
    k = 17
    ck1, ck2 = _keys(k, wide=True)
    for batch in range(1, max_batch + 1):
        sc = MerkleStepCircuit(bn256_fr, depth=32, batch=batch)
        t0 = time.time()
        pp = CyclefoldPublicParams(sc, k=k, ck_primary=ck1, ck_support=ck2)
        pp_s = time.time() - t0
        log(f"merkle batch {batch}: pp {pp_s:.1f}s; warm fold")
        warm = CyclefoldIVC(pp, [sc.tree.root])
        warm.next()
        errs = warm.verify()
        assert not errs, errs
        log(f"merkle batch {batch}: warm done; measuring")
        sc2 = MerkleStepCircuit(bn256_fr, depth=32, batch=batch)
        pp2 = CyclefoldPublicParams(sc2, k=k, ck_primary=ck1, ck_support=ck2)
        t0 = time.time()
        ivc = CyclefoldIVC(pp2, [sc2.tree.root])
        new_s = time.time() - t0
        t0 = time.time()
        ivc.next()
        next_s = time.time() - t0
        t0 = time.time()
        errs = ivc.verify()
        verify_s = time.time() - t0
        assert not errs, errs
        bn, bx, bv = BASELINE[batch]
        emit(
            {
                "stage": "merkle", "batch": batch, "k": k, "depth": 32,
                "new_s": round(new_s, 2), "next_s": round(next_s, 2),
                "verify_s": round(verify_s, 2),
                "vs_baseline": [round(bn / new_s, 2), round(bx / next_s, 2), round(bv / verify_s, 2)],
            }
        )


def stage_longfold(steps: int = 1024, segments: int = 2):
    from sirius_tpu.ivc.cyclefold_ivc import CyclefoldIVC, CyclefoldPublicParams
    from sirius_tpu.ivc.step_circuit import TrivialStepCircuit

    k = 17
    ck1, ck2 = _keys(k)
    pp = CyclefoldPublicParams(TrivialStepCircuit(arity=1), k=k, ck_primary=ck1, ck_support=ck2)
    ckpt = "/tmp/sirius_tpu_long_fold_tpu"
    total_fold_s = 0.0
    seg_steps = steps // segments
    ivc = CyclefoldIVC(pp, [0x42])
    t_last = time.time()
    while ivc.step < steps:
        t0 = time.time()
        ivc.next()
        total_fold_s += time.time() - t0
        if ivc.step % seg_steps == 0 and ivc.step < steps:
            ivc.checkpoint(ckpt)
            log(f"longfold: checkpoint at step {ivc.step}; resuming from disk")
            del ivc
            ivc = CyclefoldIVC.resume(pp, ckpt)
        if ivc.step % 64 == 0 or ivc.step <= 4:
            log(
                f"longfold: step {ivc.step}/{steps} "
                f"(avg {total_fold_s / max(ivc.step - 1, 1):.2f}s/step, "
                f"+{time.time() - t_last:.1f}s since last)"
            )
            t_last = time.time()
    ivc.checkpoint(ckpt)
    ivc = CyclefoldIVC.resume(pp, ckpt)
    t0 = time.time()
    errors = ivc.verify()
    emit(
        {
            "stage": "longfold", "steps": steps, "segments": segments, "k": k,
            "real_keys": True,
            "amortized_next_s": round(total_fold_s / max(steps - 1, 1), 3),
            "total_fold_s": round(total_fold_s, 1),
            "final_verify_s": round(time.time() - t0, 1),
            "verify_errors": [str(e) for e in errors],
            "z_final": [hex(v) for v in ivc.z_i],
        }
    )
    assert not errors, errors


def stage_scaling():
    """Measured chunk/finish split on the real chip + the 8-chip Amdahl
    model (scripts/scaling_efficiency.py), captured into the jsonl."""
    import io
    import contextlib

    import scaling_efficiency  # scripts/ is on sys.path when run as a script

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scaling_efficiency.main()
    emit({"stage": "scaling", **json.loads(buf.getvalue())})


STAGES = {
    "trivial": stage_trivial,
    "ntt": stage_ntt,
    "msm": stage_msm,
    "poseidon": stage_poseidon,
    "sha256": stage_sha256,
    "merkle": stage_merkle,
    "longfold": stage_longfold,
    "scaling": stage_scaling,
}


def main():
    from sirius_tpu.util.cache import setup_compile_cache

    setup_compile_cache()
    import jax

    log(f"backend={jax.default_backend()}")
    wanted = sys.argv[1:] or ["poseidon"]
    for name in wanted:
        fn = STAGES.get(name.split("=")[0])
        if fn is None:
            log(f"unknown stage {name}")
            continue
        log(f"=== stage {name} ===")
        try:
            if name.startswith("longfold="):
                parts = name.split("=")[1]
                n, _, segs = parts.partition(",")
                stage_longfold(int(n), int(segs or 2))
            elif name.startswith("merkle="):
                stage_merkle(int(name.split("=")[1]))
            else:
                fn()
        except Exception as exc:
            traceback.print_exc()
            emit({"stage": name, "error": repr(exc)})
        log(f"=== stage {name} done ===")


if __name__ == "__main__":
    main()
