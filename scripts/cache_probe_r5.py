"""Second-client probe: does a FRESH process get persistent-cache hits for
the expensive MSM-path programs compiled by the batch earlier today?"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
from sirius_tpu.util.cache import setup_compile_cache
setup_compile_cache()
jax.config.update("jax_log_compiles", True)
import jax.numpy as jnp
import numpy as np
t0 = time.time()
from sirius_tpu.curves.jpoint import BN256_G1, GRUMPKIN, Points
from sirius_tpu.ops.commitment import CommitmentKey

print(f"[probe +{time.time()-t0:.0f}s] backend {jax.default_backend()}", flush=True)
ck = CommitmentKey.setup(BN256_G1, 17, b"bench-primary", use_cache=True)
print(f"[probe +{time.time()-t0:.0f}s] key loaded (2^17 prefix of bench-primary)", flush=True)
f = BN256_G1.fb if hasattr(BN256_G1, 'fb') else None
vec = jnp.zeros((1 << 17, 16), jnp.uint32).at[:, 0].set(np.arange(1 << 17) % 65536)
t1 = time.time()
c1 = ck.commit_device(vec)
print(f"[probe +{time.time()-t0:.0f}s] primary commit_device(2^17) done in {time.time()-t1:.1f}s -> {c1}", flush=True)
ck2 = CommitmentKey.setup(GRUMPKIN, 17, b"bench-support", use_cache=True)
vec2 = jnp.zeros((1 << 14, 16), jnp.uint32).at[:, 0].set(np.arange(1 << 14) % 65536)
t1 = time.time()
c2 = ck2.commit_device(vec2)
print(f"[probe +{time.time()-t0:.0f}s] support commit_device(2^14) done in {time.time()-t1:.1f}s", flush=True)
print("PROBE-DONE", flush=True)
