"""Diagnose TPU persistent-compile-cache behavior across processes.

Round-4 observation: every fresh TPU process re-pays the full cold-compile
bill even though the persistent cache dir fills with entries — suspicion:
the axon PJRT plugin injects a per-process value (session uuid?) into the
compile options, so cache keys never match across processes.

This script jits one deterministic program (the 2^20 limb-first NTT — the
exact program bench.py's NTT stage compiles), with jax's cache-miss
explanation enabled, and reports compile wall-clock.  Run it twice in two
processes: a second run with a warm cache should compile in ~0 s if keys
are stable; the explain log names the differing key field when not.
"""

import sys, time

sys.path.insert(0, ".")

from sirius_tpu.util.cache import setup_compile_cache

path = setup_compile_cache()

import jax

jax.config.update("jax_explain_cache_misses", True)
try:
    jax.config.update("jax_log_compiles", True)
except Exception:
    pass

import numpy as np
import jax.numpy as jnp

from sirius_tpu.fields.jfield import FR
from sirius_tpu.fields.jfield_lf import to_lf
from sirius_tpu.ops.ntt import NTT

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 20

print(f"cache dir: {path}", flush=True)
n = 1 << LOG_N
rng = np.random.default_rng(7)
ntt = NTT(FR, LOG_N)
coeffs = jnp.asarray(to_lf(FR.encode([int(x) for x in rng.integers(0, 2**62, size=n)])))
t0 = time.time()
ntt.fft_lf(coeffs).block_until_ready()
print(f"first call (compile+run): {time.time() - t0:.2f}s", flush=True)
t0 = time.time()
ntt.fft_lf(coeffs).block_until_ready()
print(f"second call (run): {time.time() - t0:.3f}s", flush=True)
