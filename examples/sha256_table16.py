#!/usr/bin/env python
"""Cyclefold IVC folding spread-table SHA-256 compression steps — the
table16-class workload (reference `examples/sha256/main.rs:363-432` +
`examples/sha256/table16/`; BASELINE.md row: IVC new/next/verify =
105/91/10.7 s on a 64-core EPYC 7702).

Production config: half_bits=16 (2^16-row (dense, spread) table), primary
k=17; the step carries ~4.5k lookups per compression, a 3-round SPS, and 3
support delegations per fold.  `--half-bits 8 --k 15` is the CPU-checkable
scale.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fold-steps", type=int, default=1)
    ap.add_argument("--k", type=int, default=17)
    ap.add_argument("--half-bits", type=int, default=16, choices=(8, 16))
    ap.add_argument("--rounds", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    __import__("sirius_tpu.util.cache", fromlist=["setup_compile_cache"]).setup_compile_cache()

    from sirius_tpu.fields.constants import bn256_fr
    from sirius_tpu.gadgets.spread_sha256 import SpreadSha256StepCircuit
    from sirius_tpu.ivc.cyclefold_ivc import CyclefoldIVC, CyclefoldPublicParams
    from _keys import example_keys

    step = SpreadSha256StepCircuit(
        bn256_fr, half_bits=args.half_bits, rounds=args.rounds
    )
    ck1, ck2, key_kind = example_keys(args.k + 4, 17, label="sha256-table16")
    print(f"commitment keys: {key_kind}")
    t0 = time.time()
    pp = CyclefoldPublicParams(step, k=args.k, ck_primary=ck1, ck_support=ck2)
    print(f"public params ({pp.num_witness_primary} W-commitments/trace): "
          f"{time.time() - t0:.2f}s")
    t0 = time.time()
    ivc = CyclefoldIVC(pp, [0x0123456789ABCDEF])
    print(f"ivc_new: {time.time() - t0:.2f}s")
    for i in range(args.fold_steps):
        t0 = time.time()
        ivc.next()
        print(f"ivc_next {i}: {time.time() - t0:.2f}s  z_i[0]=0x{ivc.z_i[0]:x}")
    t0 = time.time()
    errors = ivc.verify()
    print(f"ivc_verify: {time.time() - t0:.2f}s ->", "OK" if not errors else errors)
    return 0 if not errors else 1


if __name__ == "__main__":
    sys.exit(main())
