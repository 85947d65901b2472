"""NTT lab retry: reload pallas_ntt (scatter-add fix) and measure the
VMEM-resident kernel vs XLA four-step at 2^20."""
import importlib
import os
import sys
import time

sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scripts")
import jax
import jax.numpy as jnp
import numpy as np


def run():
    from tpu_batch_r5 import emit, log
    import sirius_tpu.ops.pallas_ntt as pntt

    importlib.reload(pntt)
    from sirius_tpu.fields.jfield import FR
    from sirius_tpu.fields.jfield_lf import to_lf
    from sirius_tpu.ops.ntt import NTT

    log_n = 20
    n = 1 << log_n
    rng = np.random.default_rng(7)
    ntt = NTT(FR, log_n)
    coeffs = jnp.asarray(to_lf(FR.encode([int(x) for x in rng.integers(0, 2**62, size=n)])))

    def timed(fn, reps=3):
        fn().block_until_ready()
        t0 = time.time()
        for _ in range(reps):
            out = fn()
        out.block_until_ready()
        return out, (time.time() - t0) / reps

    ntt._pallas_mode = ""
    ref, xla_s = timed(lambda: ntt.fft_lf(coeffs))
    out = {"stage": "ntt_lab2", "log_n": log_n, "xla_ms": round(xla_s * 1e3, 1),
           "xla_elems_per_sec": round(n / xla_s, 1)}
    log(f"ntt_lab2: xla {xla_s*1e3:.1f} ms = {n/xla_s/1e6:.2f} M/s")

    for rblk in (128, 256, 512):
        os.environ["SIRIUS_TPU_NTT_RBLK"] = str(rblk)
        ntt._pallas_mode = "1"
        ntt._four_jit = jax.jit(ntt._four_step_core, static_argnames=("inverse",))
        try:
            t0 = time.time()
            got, pal_s = timed(lambda: ntt.fft_lf(coeffs))
            compile_s = time.time() - t0 - 4 * pal_s
            ok = bool(jnp.array_equal(got, ref))
            log(f"ntt_lab2 rblk={rblk}: {pal_s*1e3:.1f} ms = {n/pal_s/1e6:.2f} M/s bitexact={ok} compile~{compile_s:.0f}s")
            out[f"pallas_rblk{rblk}_ms"] = round(pal_s * 1e3, 1)
            out[f"pallas_rblk{rblk}_elems_per_sec"] = round(n / pal_s, 1)
            out[f"pallas_rblk{rblk}_bitexact"] = ok
            out[f"pallas_rblk{rblk}_compile_s"] = round(compile_s, 1)
        except Exception as exc:
            log(f"ntt_lab2 rblk={rblk} FAILED: {exc!r}")
            out[f"pallas_rblk{rblk}_error"] = repr(exc)[:200]
    ntt._pallas_mode = ""
    emit(out)
