#!/usr/bin/env python
"""User step-circuit template (reference `examples/my_circuit.rs`).

Shows the full surface a user needs for Sangria IVC:
  - a StepCircuit with arity A1 = 5 (vector state z)
  - `configure` registering gadget columns
  - `synthesize_step` building the transition constraints
  - `process_step` mirroring the transition off-circuit
  - PublicParams / IVC driving FOLD_STEP_COUNT folds + verify

The demo transition is z'_j = z_j + z_{(j+1) mod 5}."""

import sys
import time

sys.path.insert(0, ".")

FOLD_STEP_COUNT = 2
A1 = 5  # primary state arity
A2 = 1  # secondary (trivial) arity
TABLE_SIZE = 16


class MyStepCircuit:
    arity = A1

    def instances(self):
        return []  # no extra public instance columns

    def configure(self, cs):
        from sirius_tpu.gadgets.main_gate import MainGate

        return MainGate.configure(cs, T=5)

    def synthesize_step(self, config, ctx, z_i):
        from sirius_tpu.gadgets.main_gate import MainGate

        mg = MainGate(config, ctx.asn.p)
        return [mg.add(ctx, z_i[j], z_i[(j + 1) % A1]) for j in range(A1)]

    def process_step(self, z_i, k_table_size, spec):
        return [(z_i[j] + z_i[(j + 1) % A1]) % spec.modulus for j in range(A1)]


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    __import__("sirius_tpu.util.cache", fromlist=["setup_compile_cache"]).setup_compile_cache()

    from sirius_tpu.curves.jpoint import BN256_G1, GRUMPKIN
    from sirius_tpu.ivc.sangria_ivc import IVC, PublicParams
    from sirius_tpu.ivc.step_circuit import TrivialStepCircuit
    from _keys import example_keys

    ck1, ck2, key_kind = example_keys(args.k + 3, args.k + 3, label="my-circuit")
    print(f"commitment keys: {key_kind}")

    pp = PublicParams(
        MyStepCircuit(),
        TrivialStepCircuit(arity=A2),
        k1=TABLE_SIZE, k2=TABLE_SIZE,
        ck1=ck1, ck2=ck2,
    )
    t0 = time.time()
    ivc = IVC(pp, list(range(A1)), [0])
    print(f"ivc_new: {time.time() - t0:.2f}s")
    for i in range(FOLD_STEP_COUNT):
        t0 = time.time()
        ivc.fold_step()
        print(f"ivc_next {i}: {time.time() - t0:.2f}s  z = {ivc.primary_z_i}")
    errors = ivc.verify()
    print("ivc_verify ->", "OK" if not errors else errors)
    return 0 if not errors else 1


if __name__ == "__main__":
    sys.exit(main())
