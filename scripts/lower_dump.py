"""Dump lowered-module text for (a) a tiny pallas kernel, (b) the real MSM
chunk program, to find what differs across processes (cache-key instability)."""
import sys, hashlib
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

out_path = sys.argv[1]

# (a) tiny pallas kernel
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def tiny(x_ref, o_ref):
    o_ref[:] = x_ref[:] + jnp.uint32(1)

def tiny_call(x):
    return pl.pallas_call(
        tiny,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)

x = jnp.zeros((8, 128), jnp.uint32)
t1 = jax.jit(tiny_call).lower(x).as_text()

# (b) real MSM chunk program (trace+lower only, no compile)
from sirius_tpu.curves.jpoint import BN256_G1
from sirius_tpu.ops import pallas_msm as pm

c, size, TS = 6, 1 << 17, 32
step = pm._chunk_accum_jit(BN256_G1, c, size, TS)
W_real = pm._window_count(c)
B = 1 << (c - 1)
L = pm.L
sc = jnp.zeros((size, 16), jnp.uint32)
px = jnp.zeros((size, L), jnp.uint32)
py = jnp.zeros((size, L), jnp.uint32)
tbl = [jnp.zeros((W_real, L, B, pm.SUBL, pm.LANE), jnp.uint32)] * 3
t2 = step.lower(sc, px, py, *tbl).as_text()

with open(out_path, "w") as f:
    f.write("== TINY ==\n")
    f.write(t1)
    f.write("\n== CHUNK ==\n")
    f.write(t2)
print("tiny sha:", hashlib.sha256(t1.encode()).hexdigest()[:16])
print("chunk sha:", hashlib.sha256(t2.encode()).hexdigest()[:16])
print("chunk len:", len(t2))
