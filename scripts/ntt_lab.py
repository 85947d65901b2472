"""NTT lab stage (runs inside the live TPU claim via `lab=ntt_lab:run`):
benchmark the Pallas VMEM-resident column kernel vs the XLA four-step at
2^20, bitwise cross-check, and sweep R_blk."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax.numpy as jnp
import numpy as np


def run():
    from tpu_batch_r5 import emit, log
    from sirius_tpu.fields.jfield import FR
    from sirius_tpu.fields.jfield_lf import to_lf
    from sirius_tpu.ops.ntt import NTT

    log_n = 20
    n = 1 << log_n
    rng = np.random.default_rng(7)
    ntt = NTT(FR, log_n)
    coeffs = jnp.asarray(to_lf(FR.encode([int(x) for x in rng.integers(0, 2**62, size=n)])))

    def timed(fn, warm=1, reps=3):
        for _ in range(warm):
            fn().block_until_ready()
        t0 = time.time()
        for _ in range(reps):
            out = fn()
        out.block_until_ready()
        return out, (time.time() - t0) / reps

    ntt._pallas_mode = ""
    ref, xla_s = timed(lambda: ntt.fft_lf(coeffs))
    log(f"xla four-step: {xla_s*1e3:.1f} ms = {n/xla_s/1e6:.2f} M elems/s")
    out = {"stage": "ntt_lab", "log_n": log_n, "xla_ms": round(xla_s * 1e3, 1),
           "xla_elems_per_sec": round(n / xla_s, 1)}

    for rblk in (128, 64, 256):
        os.environ["SIRIUS_TPU_NTT_RBLK"] = str(rblk)
        ntt._pallas_mode = "1"
        ntt._four_jit = __import__("jax").jit(ntt._four_step_core, static_argnames=("inverse",))
        try:
            t0 = time.time()
            got, pal_s = timed(lambda: ntt.fft_lf(coeffs))
            compile_s = time.time() - t0 - 3 * pal_s
            ok = bool(jnp.array_equal(got, ref))
            log(f"pallas rblk={rblk}: {pal_s*1e3:.1f} ms = {n/pal_s/1e6:.2f} M elems/s, bitexact={ok}, compile~{compile_s:.0f}s")
            out[f"pallas_rblk{rblk}_ms"] = round(pal_s * 1e3, 1)
            out[f"pallas_rblk{rblk}_elems_per_sec"] = round(n / pal_s, 1)
            out[f"pallas_rblk{rblk}_bitexact"] = ok
        except Exception as exc:
            log(f"pallas rblk={rblk} FAILED: {exc!r}")
            out[f"pallas_rblk{rblk}_error"] = repr(exc)[:300]
    ntt._pallas_mode = ""
    emit(out)
