"""Warm-measured gate-degree scaling on REAL TPU + real keys (runs inside
the batch claim via lab=gatescale_lab:run).  The reference's comparison
(docs/cyclefold_report.md:213-219) — per-step fold cost vs custom-gate
degree, Sangria vs Cyclefold — previously only had compile-noise-dominated
CPU numbers (VERDICT r4 weak #8)."""
import sys, time, json

sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scripts")


def run():
    from tpu_batch_r5 import emit, log, _keys
    from sirius_tpu.fields.constants import bn256_fr
    from sirius_tpu.gadgets.power_step_circuit import PowerStepCircuit
    from sirius_tpu.ivc.cyclefold_ivc import CyclefoldIVC, CyclefoldPublicParams
    from sirius_tpu.ivc.sangria_ivc import IVC as SangriaIVC
    from sirius_tpu.ivc.sangria_ivc import PublicParams as SangriaPP
    from sirius_tpu.ivc.step_circuit import TrivialStepCircuit

    k = 17
    ck1, ck2 = _keys(k, wide=True)
    STEPS = 5
    for d in (2, 3, 4, 5, 6, 7):
        row = {"stage": "gatescale", "degree": d, "k": k, "steps": STEPS}
        try:
            sc = PowerStepCircuit(bn256_fr, degree=d)
            t0 = time.time()
            spp = SangriaPP(sc, TrivialStepCircuit(arity=1), k, k, ck1, ck2)
            ivc = SangriaIVC(spp, [0x42], [0x17])
            row["sangria_new_s"] = round(time.time() - t0, 2)
            ivc.fold_step()  # warm
            t0 = time.time()
            for _ in range(STEPS):
                ivc.fold_step()
            row["sangria_step_s"] = round((time.time() - t0) / STEPS, 3)
            errs = ivc.verify()
            assert not errs, errs

            sc2 = PowerStepCircuit(bn256_fr, degree=d)
            t0 = time.time()
            cpp = CyclefoldPublicParams(sc2, k=k, ck_primary=ck1, ck_support=ck2)
            civc = CyclefoldIVC(cpp, [0x42])
            row["cyclefold_new_s"] = round(time.time() - t0, 2)
            civc.next()  # warm
            t0 = time.time()
            for _ in range(STEPS):
                civc.next()
            row["cyclefold_step_s"] = round((time.time() - t0) / STEPS, 3)
            errs = civc.verify()
            assert not errs, errs
        except Exception as exc:
            row["error"] = repr(exc)[:200]
            log(f"gatescale degree {d} FAILED: {exc!r}")
        emit(row)
