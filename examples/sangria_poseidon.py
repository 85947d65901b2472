#!/usr/bin/env python
"""Sangria IVC with a Poseidon-hash step circuit (reference
`examples/sangria_poseidon.rs` / bench `sangria_poseidon`)."""

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
    from sirius_tpu.ivc.sangria_ivc import IVC, PublicParams
    from sirius_tpu.ivc.step_circuit import TrivialStepCircuit
    from _keys import example_keys

    ck1, ck2, key_kind = example_keys(args.k + 3, args.k + 3, label="sangria-poseidon")
    print(f"commitment keys: {key_kind}")

    pp = PublicParams(
        PoseidonStepCircuit(bn256_fr, repeat_count=args.repeat_count),
        TrivialStepCircuit(arity=1),
        k1=args.k, k2=args.k,
        ck1=ck1, ck2=ck2,
    )
    t0 = time.time()
    ivc = IVC(pp, [0x42], [0])
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
