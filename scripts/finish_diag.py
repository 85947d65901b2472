"""Diagnose the 600s MSM finish compile: merge kernel alone vs full finish."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from sirius_tpu.util.cache import setup_compile_cache
setup_compile_cache()
import numpy as np
from sirius_tpu.curves.jpoint import BN256_G1
from sirius_tpu.ops import pallas_msm as pm

c = 6
W = pm._window_count(c)
B = 1 << (c - 1)
WB = W * B
WBp = ((WB + pm.LANE - 1) // pm.LANE) * pm.LANE
L = pm.L

t0 = time.time()
merge = pm._merge_call(BN256_G1, WBp)
args = [jnp.zeros((L, pm.GROUPS, WBp), jnp.uint32)] * 3
r = merge(*args)
jax.block_until_ready(r)
print(f"merge-only compile+run: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
fin = pm._finish_jit(BN256_G1, c)
tbl = [jnp.zeros((W, L, B, pm.SUBL, pm.LANE), jnp.uint32)] * 3
out = fin(*tbl)
jax.block_until_ready(out)
print(f"full finish compile+run: {time.time()-t0:.1f}s", flush=True)
print("DIAG-DONE", flush=True)
