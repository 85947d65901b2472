#!/usr/bin/env python
"""Sangria IVC with a step circuit exposing its own public instances
(reference `examples/instances.rs`): per-step public values are
hash-chained into the accumulator's `SCInstancesHashAcc` (off- AND
on-circuit) rather than folded.

Step: z' = z^5, with z' also exposed in the step circuit's own instance
column each step.
"""

import argparse
import sys
import time
from dataclasses import dataclass, field

sys.path.insert(0, ".")


@dataclass
class PublicPow5Circuit:
    """z_{i+1} = z_i^5, exposed as a public instance (one column, one row)."""

    field_spec: object
    arity: int = 1
    _pub: list = field(default_factory=lambda: [0])

    def configure(self, cs):
        from sirius_tpu.gadgets.main_gate import MainGate

        mg_cfg = MainGate.configure(cs, T=5)
        inst = cs.instance_column()
        return (mg_cfg, inst)

    def instances(self):
        return [list(self._pub)]

    def synthesize_step(self, config, ctx, z_i):
        from sirius_tpu.gadgets.main_gate import MainGate

        mg_cfg, inst = config
        mg = MainGate(mg_cfg, ctx.asn.p)
        out = mg.pow5(ctx, z_i[0])
        ctx.asn.copy(out.column, out.row, inst, 0)
        self._pub = [out.value]
        return [out]

    def process_step(self, z_i, k_table_size, spec):
        out = pow(z_i[0], 5, spec.modulus)
        self._pub = [out]
        return [out]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fold-steps", type=int, default=1)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    __import__("sirius_tpu.util.cache", fromlist=["setup_compile_cache"]).setup_compile_cache()

    from sirius_tpu.curves.jpoint import BN256_G1, GRUMPKIN
    from sirius_tpu.fields.constants import bn256_fr
    from sirius_tpu.ivc.sangria_ivc import IVC, PublicParams
    from sirius_tpu.ivc.step_circuit import TrivialStepCircuit
    from _keys import example_keys

    ck1, ck2, key_kind = example_keys(args.k + 3, args.k + 3, label="instances")
    print(f"commitment keys: {key_kind}")

    t0 = time.time()
    pp = PublicParams(
        PublicPow5Circuit(bn256_fr),
        TrivialStepCircuit(arity=1),
        k1=args.k, k2=args.k,
        ck1=ck1, ck2=ck2,
    )
    print(f"public params: {time.time() - t0:.2f}s "
          f"(primary sc instance lens: {pp.primary_probe.sc_instance_lens})")
    t0 = time.time()
    ivc = IVC(pp, [3], [0])
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
