#!/usr/bin/env python
"""Cyclefold IVC with a lookup-bearing step circuit.

The reference folds lookup-heavy circuits (e.g. the table16 SHA-256 of
`examples/sha256/main.rs:363-432`) only through cyclefold; this drives the
same mechanism minimally: a vector-lookup step (3-round SPS) gives the
primary trace 3 W-commitments, and every fold step delegates 3 chained
support-circuit scalar-muls on the paired curve.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fold-steps", type=int, default=1)
    ap.add_argument("--k", type=int, default=18)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    __import__("sirius_tpu.util.cache", fromlist=["setup_compile_cache"]).setup_compile_cache()

    from sirius_tpu.curves.jpoint import BN256_G1, GRUMPKIN
    from sirius_tpu.gadgets.xor_lookup_step_circuit import XorLookupStepCircuit
    from sirius_tpu.ivc.cyclefold_ivc import CyclefoldIVC, CyclefoldPublicParams
    from _keys import example_keys

    ck1, ck2, key_kind = example_keys(args.k + 3, 17, label="cyclefold-lookup")
    print(f"commitment keys: {key_kind}")
    t0 = time.time()
    pp = CyclefoldPublicParams(
        XorLookupStepCircuit(key=3), k=args.k,
        ck_primary=ck1, ck_support=ck2,
    )
    print(f"public params ({pp.num_witness_primary} W-commitments/trace): "
          f"{time.time() - t0:.2f}s")
    t0 = time.time()
    ivc = CyclefoldIVC(pp, [2])
    print(f"ivc_new: {time.time() - t0:.2f}s")
    for i in range(args.fold_steps):
        t0 = time.time()
        ivc.next()
        print(f"ivc_next {i}: {time.time() - t0:.2f}s  z_i={ivc.z_i}")
    t0 = time.time()
    errors = ivc.verify()
    print(f"ivc_verify: {time.time() - t0:.2f}s ->", "OK" if not errors else errors)
    return 0 if not errors else 1


if __name__ == "__main__":
    sys.exit(main())
