#!/usr/bin/env python
"""Cyclefold IVC with a Poseidon-hash step circuit (reference
`examples/cyclefold_poseidon.rs`): exercises ProtoGalaxy folding of a
multi-gate / 1-challenge primary instance."""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fold-steps", type=int, default=1)
    ap.add_argument("--repeat-count", type=int, default=1)
    ap.add_argument("--k", type=int, default=17)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    __import__("sirius_tpu.util.cache", fromlist=["setup_compile_cache"]).setup_compile_cache()

    from sirius_tpu.curves.jpoint import BN256_G1, GRUMPKIN
    from sirius_tpu.fields.constants import bn256_fr
    from sirius_tpu.gadgets.poseidon_step_circuit import PoseidonStepCircuit
    from sirius_tpu.ivc.cyclefold_ivc import CyclefoldIVC, CyclefoldPublicParams
    from _keys import example_keys

    ck1, ck2, key_kind = example_keys(args.k + 3, 17, label="cyclefold-poseidon")
    print(f"commitment keys: {key_kind}")
    t0 = time.time()
    pp = CyclefoldPublicParams(
        PoseidonStepCircuit(bn256_fr, repeat_count=args.repeat_count),
        k=args.k,
        ck_primary=ck1, ck_support=ck2,
    )
    print(f"public params: {time.time() - t0:.2f}s "
          f"(gates={pp.n_gates}, challenges={pp.num_challenges_primary})")
    t0 = time.time()
    ivc = CyclefoldIVC(pp, [0x11])
    print(f"ivc_new: {time.time() - t0:.2f}s")
    for i in range(args.fold_steps):
        t0 = time.time()
        ivc.next()
        print(f"ivc_next {i}: {time.time() - t0:.2f}s")
    t0 = time.time()
    errors = ivc.verify()
    print(f"ivc_verify: {time.time() - t0:.2f}s ->", "OK" if not errors else errors)
    return 0 if not errors else 1


if __name__ == "__main__":
    sys.exit(main())
