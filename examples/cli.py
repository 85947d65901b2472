#!/usr/bin/env python
"""CLI driver (reference `examples/cli.rs`): choose the IVC mode, table
sizes, fold-step count and profiling output."""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser(prog="sirius-tpu-cli")
    ap.add_argument("mode", choices=[
        "sangria-trivial", "sangria-poseidon", "sangria-instances",
        "sangria-merkle", "sangria-range-lookup", "sangria-xor-lookup",
        "cyclefold-trivial", "cyclefold-poseidon", "cyclefold-lookup", "bench-msm",
    ], help="which pipeline to run")
    ap.add_argument("--fold-steps", type=int, default=1)
    ap.add_argument("--primary-k", type=int, default=16)
    ap.add_argument("--repeat-count", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--profile-json", type=str, default=None,
                    help="append span JSON lines to this file (reference tracing-json analogue)")
    args = ap.parse_args()

    import os

    if args.profile_json:
        os.environ["SIRIUS_TPU_PROFILE"] = "1"
        os.environ["SIRIUS_TPU_PROFILE_JSON"] = args.profile_json

    if args.mode == "sangria-trivial":
        sys.argv = ["x", "--fold-steps", str(args.fold_steps), "--k", str(args.primary_k)] + (
            ["--cpu"] if args.cpu else []
        )
        from examples.sangria_trivial import main as m

        return m()
    if args.mode == "sangria-poseidon":
        sys.argv = ["x", "--fold-steps", str(args.fold_steps), "--k", str(args.primary_k),
                    "--repeat-count", str(args.repeat_count)] + (["--cpu"] if args.cpu else [])
        from examples.sangria_poseidon import main as m

        return m()
    simple = {
        "sangria-instances": "examples.instances",
        "sangria-merkle": "examples.merkle_tree",
        "sangria-range-lookup": "examples.range_lookup",
        "sangria-xor-lookup": "examples.xor_lookup",
        "cyclefold-trivial": "examples.cyclefold_trivial",
        "cyclefold-poseidon": "examples.cyclefold_poseidon",
        "cyclefold-lookup": "examples.cyclefold_lookup",
    }
    if args.mode in simple:
        import importlib

        sys.argv = ["x", "--fold-steps", str(args.fold_steps)] + (
            ["--cpu"] if args.cpu else []
        )
        return importlib.import_module(simple[args.mode]).main()
    if args.mode == "bench-msm":
        import bench

        bench.main()
        return 0


if __name__ == "__main__":
    sys.exit(main())
