#!/usr/bin/env python
"""Sangria IVC with a lookup-using step circuit (analogue of the
reference's `fibo_circuit_with_lookup` flows): z' = low64(z^2 + z + 5)
with byte-table range checks -> 2-round SPS (2 witness commitments,
2 challenges) folded through the 2-cycle."""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fold-steps", type=int, default=1)
    ap.add_argument("--k", type=int, default=17)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    __import__("sirius_tpu.util.cache", fromlist=["setup_compile_cache"]).setup_compile_cache()

    from sirius_tpu.curves.jpoint import BN256_G1, GRUMPKIN
    from sirius_tpu.fields.constants import bn256_fr
    from sirius_tpu.gadgets.range_step_circuit import RangeCheckStepCircuit
    from sirius_tpu.ivc.sangria_ivc import IVC, PublicParams
    from sirius_tpu.ivc.step_circuit import TrivialStepCircuit
    from _keys import example_keys

    ck1, ck2, key_kind = example_keys(args.k + 3, args.k + 3, label="range-lookup")
    print(f"commitment keys: {key_kind}")

    t0 = time.time()
    pp = PublicParams(
        RangeCheckStepCircuit(bn256_fr),
        TrivialStepCircuit(arity=1),
        k1=args.k, k2=args.k,
        ck1=ck1, ck2=ck2,
    )
    print(f"public params: {time.time() - t0:.2f}s "
          f"(primary probe: ct={pp.primary_probe.num_cross_terms}, "
          f"nc={pp.primary_probe.num_challenges}, nw={pp.primary_probe.num_witness})")
    t0 = time.time()
    ivc = IVC(pp, [7], [0])
    print(f"ivc_new: {time.time() - t0:.2f}s")
    for i in range(args.fold_steps):
        t0 = time.time()
        ivc.fold_step()
        print(f"ivc_next {i}: {time.time() - t0:.2f}s")
    t0 = time.time()
    errors = ivc.verify()
    print(f"ivc_verify: {time.time() - t0:.2f}s ->", "OK" if not errors else errors)
    return 0 if not errors else 1


if __name__ == "__main__":
    sys.exit(main())
