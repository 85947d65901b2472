import time, sys
t0=time.time()
from sirius_tpu.util.cache import setup_compile_cache
setup_compile_cache()
import jax
print('import+init', round(time.time()-t0,1), jax.default_backend(), flush=True)
from sirius_tpu.curves.jpoint import BN256_G1
from sirius_tpu.curves import hash_to_curve as h2c
import hashlib
n = 1<<18
t0=time.time()
stream = hashlib.shake_256(b'bench-primary').digest(64*n)
print('xof', round(time.time()-t0,2), flush=True)
chunk = 1<<16
for i in range(0, n, chunk):
    t0=time.time()
    pts = h2c.hash_bytes_to_points_device(BN256_G1, stream[i*64:(i+chunk)*64])
    pts.x.block_until_ready()
    print('chunk', i//chunk, round(time.time()-t0,1), flush=True)
