#!/usr/bin/env python
"""IVC proving a chain of Poseidon-Merkle-tree updates (reference
`examples/merkle/`, depth-32 tree, cyclefold driver; BASELINE.md rows
"Merkle update, batch 1..5").  Each step witnesses `batch` authentication
paths, proves old-root == z_i, and advances to the new root.

--sweep runs batch 1..5 and prints the comparison table against the
reference's EPYC numbers (`docs/cyclefold_report.md:205-209`).  The
reference's `ipa.rs`/`kzg.rs` companions are vanilla-halo2 one-shot SNARK
baselines, not sirius capabilities — see PARITY.md §descope."""

import argparse
import sys
import time

sys.path.insert(0, ".")

# docs/cyclefold_report.md:205-209 (EPYC 7702 64c)
BASELINE = {
    1: (24.7, 16.4, 3.98),
    2: (30.0, 19.5, 3.97),
    3: (35.7, 22.4, 4.01),
    4: (41.7, 25.7, 4.19),
    5: (47.8, 28.7, 4.35),
}


def run_once(args, batch):
    from sirius_tpu.fields.constants import bn256_fr
    from sirius_tpu.gadgets.merkle_step_circuit import MerkleStepCircuit
    from _keys import example_keys

    sc = MerkleStepCircuit(bn256_fr, depth=args.depth, batch=batch)
    if args.driver == "sangria":
        from sirius_tpu.ivc.sangria_ivc import IVC, PublicParams
        from sirius_tpu.ivc.step_circuit import TrivialStepCircuit

        ck1, ck2, kind = example_keys(args.k + 3, args.k + 3, label="merkle")
        t0 = time.time()
        pp = PublicParams(sc, TrivialStepCircuit(arity=1), k1=args.k, k2=args.k,
                          ck1=ck1, ck2=ck2)
        pp_s = time.time() - t0
        t0 = time.time()
        ivc = IVC(pp, [sc.tree.root], [0])
        new_s = time.time() - t0
        step = ivc.fold_step
    else:
        from sirius_tpu.ivc.cyclefold_ivc import CyclefoldIVC, CyclefoldPublicParams

        ck1, ck2, kind = example_keys(args.k + 3, 17, label="merkle-cf")
        t0 = time.time()
        pp = CyclefoldPublicParams(sc, k=args.k, ck_primary=ck1, ck_support=ck2)
        pp_s = time.time() - t0
        t0 = time.time()
        ivc = CyclefoldIVC(pp, [sc.tree.root])
        new_s = time.time() - t0
        step = ivc.next

    next_times = []
    for _ in range(args.fold_steps):
        t0 = time.time()
        step()
        next_times.append(time.time() - t0)
    t0 = time.time()
    errors = ivc.verify()
    verify_s = time.time() - t0
    assert not errors, errors
    return {"keys": kind, "pp_s": pp_s, "new_s": new_s,
            "next_s": min(next_times), "verify_s": verify_s}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fold-steps", type=int, default=1)
    ap.add_argument("--depth", type=int, default=32)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--k", type=int, default=17)
    ap.add_argument("--driver", choices=("cyclefold", "sangria"), default="cyclefold")
    ap.add_argument("--sweep", action="store_true", help="batch 1..5 comparison table")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    __import__("sirius_tpu.util.cache", fromlist=["setup_compile_cache"]).setup_compile_cache()

    if not args.sweep:
        r = run_once(args, args.batch)
        print(f"keys: {r['keys']}  pp: {r['pp_s']:.2f}s")
        print(f"ivc_new: {r['new_s']:.2f}s  ivc_next: {r['next_s']:.2f}s  "
              f"ivc_verify: {r['verify_s']:.2f}s")
        return 0

    print(f"batch | ivc_new (ref)    | ivc_next (ref)   | ivc_verify (ref)")
    for batch in range(1, 6):
        r = run_once(args, batch)
        bn, bx, bv = BASELINE[batch]
        print(f"{batch:5d} | {r['new_s']:7.2f} ({bn:6.1f}) | "
              f"{r['next_s']:7.2f} ({bx:6.1f}) | {r['verify_s']:7.2f} ({bv:5.2f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
