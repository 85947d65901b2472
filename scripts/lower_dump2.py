import sys, hashlib
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from sirius_tpu.curves.jpoint import BN256_G1
from sirius_tpu.ops import pallas_msm as pm

c = 6
W_real = pm._window_count(c)
B = 1 << (c - 1)
fin = pm._finish_jit(BN256_G1, c)
tbl = [jnp.zeros((W_real, pm.L, B, pm.SUBL, pm.LANE), jnp.uint32)] * 3
t = fin.lower(*tbl).as_text()
print("finish sha:", hashlib.sha256(t.encode()).hexdigest()[:16], "len:", len(t))
open(sys.argv[1], "w").write(t)
