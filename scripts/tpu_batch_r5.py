"""Round-5 TPU batch: every TPU-bound deliverable in ONE process.

Same claim-discipline as round 4 (`tpu_batch_r4.py`): the axon tunnel
admits one client and a killed client leaves a ~25-min stale claim, so all
TPU work runs inside one long-lived process that exits naturally.

New in round 5: the stage list is read from a PLAN FILE
(`scripts/out/r5_plan.txt`, one stage per line) which is re-read between
stages — stages can be appended while the batch runs, and `END` terminates
the run.  Every emitted row carries a `host` tag and cold-cache flags
(ADVICE round-4 items).

Stages:
  trivial      BASELINE trivial row, k=17: COLD new/next (the compile-wall
               metric, VERDICT r4 ask #3) + steady-state
  poseidon     BASELINE poseidon row (k=17)
  sha256       BASELINE sha256 row (H=16/k=18 spread-table step)  [ask #1]
  merkle=N     merkle batch 1..N sweep                            [ask #2]
  k20          trivial row at the reference's k=20 / 2^23 key     [ask #4]
  ntt / msm    kernel micro-benches (also prewarms driver bench programs)
  longfold=N,S N cyclefold steps through S checkpoint segments, with
               per-step timing histogram                          [ask #7]

Usage:  python scripts/tpu_batch_r5.py   (plan file drives everything)
"""

from __future__ import annotations

import json
import os
import socket
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OUT = "scripts/out/tpu_batch_r5.jsonl"
PLAN = "scripts/out/r5_plan.txt"
_T0 = time.time()
HOST = socket.gethostname()[:16]


def log(msg):
    print(f"[r5_batch +{time.time() - _T0:8.1f}s] {msg}", file=sys.stderr, flush=True)


def emit(rec: dict):
    rec.setdefault("host", HOST)
    rec.setdefault("t_wall", round(time.time() - _T0, 1))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _keys(ivc_k: int, wide: bool = False, key_k: int | None = None):
    """wide=True for gate-adding step circuits (poseidon/sha256/merkle):
    their SFCs commit ~14 columns, overflowing an ivc_k+3 key."""
    from sirius_tpu.curves.jpoint import BN256_G1, GRUMPKIN
    from sirius_tpu.ivc.cyclefold_ivc import SUPPORT_K
    from sirius_tpu.ops.commitment import CommitmentKey

    if key_k is None:
        key_k = max(ivc_k + (4 if wide else 3), 20)
    t0 = time.time()
    ck1 = CommitmentKey.setup(BN256_G1, key_k, b"bench-primary", use_cache=True)
    ck2 = CommitmentKey.setup(GRUMPKIN, SUPPORT_K + 3, b"bench-support", use_cache=True)
    log(f"keys: primary 2^{key_k} + support ready in {time.time() - t0:.1f}s")
    return ck1, ck2


def _ivc_stage(stage: str, step_kind: str, k: int, wide: bool, key_k: int | None = None):
    import bench

    ck1, ck2 = _keys(k, wide=wide, key_k=key_k)
    out: dict = {"stage": stage, "k": k, "cold_cache": not _cache_warm.get(step_kind + str(k))}
    t0 = time.time()
    bench.bench_cyclefold_ivc(k, ck1, ck2, out, step_kind, prefix="ivc")
    _cache_warm[step_kind + str(k)] = True
    # bench_cyclefold_ivc names the first-invocation fields ivc_warm_*; they
    # are COLD path (compile-inclusive) — rename honestly (ADVICE r4 item 2)
    for old, new in [("ivc_warm_new_s", "ivc_cold_new_s"), ("ivc_warm_next_s", "ivc_cold_next_s"), ("ivc_warm_s", "ivc_cold_verify_s")]:
        if old in out:
            out[new] = out.pop(old)
    b = bench.BASELINES.get(step_kind)
    if b:
        out["vs_baseline_new"] = round(b["new"] / out["ivc_new_s"], 3)
        out["vs_baseline_next"] = round(b["next"] / out["ivc_next_s"], 3)
        out["vs_baseline_verify"] = round(b["verify"] / out["ivc_verify_s"], 3)
    emit(out)


_cache_warm: dict = {}


def stage_trivial():
    _ivc_stage("trivial_ivc", "trivial", 17, wide=False)


def stage_poseidon():
    _ivc_stage("poseidon_ivc", "poseidon", 17, wide=True)


def stage_sha256():
    _ivc_stage("sha256_ivc", "sha256", 18, wide=True)


def stage_k20():
    _ivc_stage("trivial_ivc_k20", "trivial", 20, wide=False, key_k=23)


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
        t0 = time.time()
        warm = CyclefoldIVC(pp, [sc.tree.root])
        cold_new_s = time.time() - t0
        t0 = time.time()
        warm.next()
        cold_next_s = time.time() - t0
        errs = warm.verify()
        assert not errs, errs
        log(f"merkle batch {batch}: cold new {cold_new_s:.1f}s next {cold_next_s:.1f}s; measuring")
        # steady-state over the SAME pp (same structure => same compiled
        # programs); rebuilding pp recompiles everything and times compiles,
        # not folds (bug in the first r5 merkle batch-1 row)
        sc.tree.reset() if hasattr(sc, "tree") and hasattr(sc.tree, "reset") else None
        t0 = time.time()
        ivc = CyclefoldIVC(pp, [sc.tree.root])
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
                "cold_new_s": round(cold_new_s, 2), "cold_next_s": round(cold_next_s, 2),
                "new_s": round(new_s, 2), "next_s": round(next_s, 2),
                "verify_s": round(verify_s, 2),
                "vs_baseline": [round(bn / new_s, 2), round(bx / next_s, 2), round(bv / verify_s, 2)],
            }
        )


def stage_ntt():
    import bench

    out = {"stage": "ntt", "log_n": 20}
    out["elems_per_sec"] = round(bench.bench_ntt(20), 1)
    out["vs_epyc_proxy"] = round(out["elems_per_sec"] / bench.BASELINE_NTT_ELEMS_PER_SEC, 3)
    emit(out)


def stage_msm():
    import bench
    from sirius_tpu.curves.jpoint import BN256_G1

    ck1, _ = _keys(17)
    out = {"stage": "msm", "log_n": 20}
    out["points_per_sec"] = round(bench.bench_msm(BN256_G1, 20, ck1), 1)
    out["vs_baseline"] = round(out["points_per_sec"] / bench.BASELINE_MSM_POINTS_PER_SEC, 3)
    emit(out)


def stage_longfold(steps: int = 1024, segments: int = 2):
    from sirius_tpu.ivc.cyclefold_ivc import CyclefoldIVC, CyclefoldPublicParams
    from sirius_tpu.ivc.step_circuit import TrivialStepCircuit

    k = 17
    ck1, ck2 = _keys(k)
    pp = CyclefoldPublicParams(TrivialStepCircuit(arity=1), k=k, ck_primary=ck1, ck_support=ck2)
    ckpt = "/tmp/sirius_tpu_long_fold_r5"
    total_fold_s = 0.0
    ckpt_save_s = 0.0
    ckpt_load_s = 0.0
    seg_steps = max(steps // segments, 1)
    step_times: list[float] = []
    ivc = CyclefoldIVC(pp, [0x42])
    t_last = time.time()
    while ivc.step < steps:
        t0 = time.time()
        ivc.next()
        dt = time.time() - t0
        total_fold_s += dt
        step_times.append(dt)
        if ivc.step % seg_steps == 0 and ivc.step < steps:
            t0 = time.time()
            ivc.checkpoint(ckpt)
            ckpt_save_s += time.time() - t0
            log(f"longfold: checkpoint at step {ivc.step}; resuming from disk")
            del ivc
            t0 = time.time()
            ivc = CyclefoldIVC.resume(pp, ckpt)
            ckpt_load_s += time.time() - t0
        if ivc.step % 64 == 0 or ivc.step <= 4:
            log(
                f"longfold: step {ivc.step}/{steps} "
                f"(avg {total_fold_s / max(ivc.step - 1, 1):.2f}s/step, "
                f"+{time.time() - t_last:.1f}s since last)"
            )
            t_last = time.time()
    t0 = time.time()
    ivc.checkpoint(ckpt)
    ckpt_save_s += time.time() - t0
    t0 = time.time()
    ivc = CyclefoldIVC.resume(pp, ckpt)
    ckpt_load_s += time.time() - t0
    t0 = time.time()
    errors = ivc.verify()
    verify_s = time.time() - t0
    assert not errors, errors
    st = sorted(step_times)
    n = len(st)
    emit(
        {
            "stage": "longfold", "k": k, "steps": steps, "segments": segments,
            "total_fold_s": round(total_fold_s, 1),
            "amortized_s_per_step": round(total_fold_s / max(steps - 1, 1), 3),
            "step_p50": round(st[n // 2], 3), "step_p90": round(st[(n * 9) // 10], 3),
            "step_p99": round(st[(n * 99) // 100], 3), "step_max": round(st[-1], 3),
            "step_min": round(st[0], 3),
            "first_step_s": round(step_times[0], 3),
            "ckpt_save_s": round(ckpt_save_s, 1), "ckpt_load_s": round(ckpt_load_s, 1),
            "verify_s": round(verify_s, 1),
        }
    )
    # full per-step series for amortization analysis
    with open("scripts/out/r5_longfold_steps.json", "w") as fh:
        json.dump([round(x, 4) for x in step_times], fh)


STAGES = {
    "trivial": stage_trivial,
    "poseidon": stage_poseidon,
    "sha256": stage_sha256,
    "k20": stage_k20,
    "ntt": stage_ntt,
    "msm": stage_msm,
}


def run_stage(spec: str) -> None:
    spec = spec.strip()
    t0 = time.time()
    log(f"=== stage {spec} start ===")
    try:
        if spec.startswith("lab="):
            # lab=module:fn — import (or reload) a module and call fn();
            # lets freshly-written experiment code run inside the live claim
            import importlib

            modname, fnname = spec[4:].split(":")
            mod = importlib.import_module(modname)
            mod = importlib.reload(mod)
            getattr(mod, fnname)()
        elif spec.startswith("merkle"):
            n = int(spec.split("=")[1]) if "=" in spec else 5
            stage_merkle(n)
        elif spec.startswith("longfold"):
            args = spec.split("=")[1].split(",") if "=" in spec else ["1024", "2"]
            stage_longfold(int(args[0]), int(args[1]) if len(args) > 1 else 2)
        else:
            STAGES[spec]()
        log(f"=== stage {spec} DONE in {time.time() - t0:.1f}s ===")
    except Exception as exc:
        log(f"=== stage {spec} FAILED after {time.time() - t0:.1f}s: {exc!r} ===")
        traceback.print_exc(file=sys.stderr)
        emit({"stage": spec, "error": repr(exc)})


def main():
    import jax

    from sirius_tpu.util.cache import setup_compile_cache

    path = setup_compile_cache()
    jax.config.update("jax_log_compiles", True)
    log(f"backend {jax.default_backend()}; compile cache {path}")

    done = 0
    idle_since = time.time()
    while True:
        try:
            lines = [l.strip() for l in open(PLAN) if l.strip() and not l.startswith("#")]
        except FileNotFoundError:
            lines = []
        if done < len(lines):
            spec = lines[done]
            done += 1
            if spec == "END":
                log("plan END; exiting")
                return
            run_stage(spec)
            idle_since = time.time()
        else:
            if time.time() - idle_since > 3600:
                log("idle > 1h; exiting")
                return
            time.sleep(20)


if __name__ == "__main__":
    main()
