"""Gate-degree scaling bench: Sangria vs Cyclefold fold-step cost.

Analogue of reference `benches/ivc_gate_scaling.rs` (FOLD_STEP_COUNT=5):
sweep the step circuit's custom-gate degree 2..9 and record per-step
wall-clock for both IVC drivers.  The comparison the reference's report
draws (docs/cyclefold_report.md:213-219): cyclefold scales linearly and
flatter in gate degree than sangria.

Usage (CPU, mock keys, small k — shape comparison, not absolute numbers):
  python scripts/gate_scaling_bench.py [--k 17] [--steps 5] [--degrees 2..9]
Emits JSON lines + a CSV at scripts/gate_scaling.csv.
"""

from __future__ import annotations

import argparse
import csv
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=17)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--degrees", type=str, default="2,3,4,5,6,7,8,9")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--real-keys", action="store_true")
    ap.add_argument("--warm", action="store_true", help="one warmup fold per driver before the timed steps (compile-free per-step numbers)")
    ap.add_argument("--out", type=str, default="scripts/gate_scaling.csv")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    __import__("sirius_tpu.util.cache", fromlist=["setup_compile_cache"]).setup_compile_cache()

    from sirius_tpu.curves.jpoint import BN256_G1, GRUMPKIN
    from sirius_tpu.fields.constants import bn256_fr
    from sirius_tpu.gadgets.power_step_circuit import PowerStepCircuit
    from sirius_tpu.ivc.cyclefold_ivc import SUPPORT_K, CyclefoldIVC, CyclefoldPublicParams
    from sirius_tpu.ivc.sangria_ivc import IVC as SangriaIVC
    from sirius_tpu.ivc.sangria_ivc import PublicParams as SangriaPP
    from sirius_tpu.ops.commitment import CommitmentKey
    from sirius_tpu.util.testing import MockCommitmentKey

    if args.real_keys:
        ck1 = CommitmentKey.setup(BN256_G1, args.k + 3, b"gate-scaling-primary")
        ck2 = CommitmentKey.setup(GRUMPKIN, max(args.k + 3, SUPPORT_K + 2), b"gate-scaling-support")
    else:
        ck1, ck2 = MockCommitmentKey(BN256_G1), MockCommitmentKey(GRUMPKIN)

    rows = []
    for d in [int(x) for x in args.degrees.split(",")]:
        sc = PowerStepCircuit(bn256_fr, degree=d)

        # --- sangria (power circuit on the primary, trivial secondary)
        from sirius_tpu.ivc.step_circuit import TrivialStepCircuit

        t0 = time.time()
        spp = SangriaPP(sc, TrivialStepCircuit(arity=1), args.k, args.k, ck1, ck2)
        ivc = SangriaIVC(spp, [0x42], [0x17])
        new_s = time.time() - t0
        if args.warm:
            ivc.fold_step()
        t0 = time.time()
        for _ in range(args.steps):
            ivc.fold_step()
        sangria_step = (time.time() - t0) / args.steps
        errs = ivc.verify()
        assert not errs, errs

        # --- cyclefold
        sc2 = PowerStepCircuit(bn256_fr, degree=d)
        t0 = time.time()
        cpp = CyclefoldPublicParams(sc2, k=args.k, ck_primary=ck1, ck_support=ck2)
        civc = CyclefoldIVC(cpp, [0x42])
        cnew_s = time.time() - t0
        if args.warm:
            civc.next()
        t0 = time.time()
        for _ in range(args.steps):
            civc.next()
        cyclefold_step = (time.time() - t0) / args.steps
        errs = civc.verify()
        assert not errs, errs

        row = {
            "degree": d,
            "sangria_new_s": round(new_s, 2),
            "sangria_step_s": round(sangria_step, 2),
            "cyclefold_new_s": round(cnew_s, 2),
            "cyclefold_step_s": round(cyclefold_step, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

        # every degree compiles a fresh set of big programs; on XLA:CPU the
        # accumulated live executables exhaust memory after ~4 degrees
        # ("LLVM compilation error: Cannot allocate memory") — drop the
        # protocol-level compiled caches between degrees like tests/conftest
        from sirius_tpu.nifs import protogalaxy as _pg
        from sirius_tpu.nifs import sangria as _sg
        from sirius_tpu.plonk import eval as _ev
        from sirius_tpu.plonk import permutation as _pm

        _pg._PG_COMPILED.clear()
        _sg._FOLD_COMPILED.clear()
        _ev._COMPILED_CACHE.clear()
        _pm._PERM_IDX_CACHE.clear()
        jax.clear_caches()

    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(json.dumps({"csv": args.out, "rows": len(rows)}))


if __name__ == "__main__":
    main()
