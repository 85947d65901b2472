"""Compute the persistent-cache key for the MSM finish program WITHOUT
compiling, logging each key component's running hash (cache_key DEBUG)."""
import sys, logging
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

logging.basicConfig(level=logging.WARNING)
logging.getLogger("jax._src.cache_key").setLevel(logging.DEBUG)
h = logging.StreamHandler(sys.stdout)
h.setLevel(logging.DEBUG)
logging.getLogger("jax._src.cache_key").addHandler(h)

from sirius_tpu.curves.jpoint import BN256_G1
from sirius_tpu.ops import pallas_msm as pm

c = 6
W = pm._window_count(c)
B = 1 << (c - 1)
fin = pm._finish_jit(BN256_G1, c)
tbl = [jnp.zeros((W, pm.L, B, pm.SUBL, pm.LANE), jnp.uint32)] * 3
lowered = fin.lower(*tbl)

from jax._src import cache_key as ck_mod
from jax._src import compiler
from jax._src import xla_bridge

backend = jax.extend.backend.get_backend()
exec_devices = jax.devices()
module = lowered._lowering.stablehlo_module() if hasattr(lowered._lowering, 'stablehlo_module') else lowered._lowering._hlo
opts = lowered._lowering.compile_args["executable_build_options"] if "executable_build_options" in getattr(lowered._lowering, 'compile_args', {}) else None
from jax._src.interpreters import mlir
comp_opts = lowered.compile_args if hasattr(lowered, 'compile_args') else None
# use the public-ish path: compiler.get_cache_key if present
try:
    key = compiler.get_cache_key(module, exec_devices, opts, backend)
    print("KEY:", key)
except Exception as e:
    print("direct get_cache_key failed:", e)
    # fall back: replicate compile options via lowered.compile() would compile; instead use cache_key.get with minimal opts
    from jax._src.lib import xla_client
    co = xla_client.CompileOptions()
    key = ck_mod.get(module, exec_devices, co, backend)
    print("KEY(minimal-opts):", key[-20:])
