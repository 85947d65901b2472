import os
os.environ.pop('PALLAS_AXON_POOL_IPS', None)
import jax
jax.config.update('jax_platforms','cpu')
import numpy as np, hashlib
from sirius_tpu.curves.jpoint import BN256_G1, GRUMPKIN
from sirius_tpu.curves.hash_to_curve import hash_bytes_to_points_device, hash_bytes_to_point
for curve in (BN256_G1, GRUMPKIN):
    n = 32
    stream = hashlib.shake_256(b'h2c-test-' + curve.spec.name.encode()).digest(64*n)
    pts = hash_bytes_to_points_device(curve, stream)
    dec = curve.decode(pts)
    for i in range(n):
        want = hash_bytes_to_point(curve.spec, stream[i*64:(i+1)*64])
        assert dec[i] == want, (curve.spec.name, i, dec[i], want)
    print(curve.spec.name, 'OK', flush=True)
