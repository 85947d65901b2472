import time
import jax, jax.numpy as jnp, numpy as np
from sirius_tpu.util.cache import setup_compile_cache
setup_compile_cache()
from sirius_tpu.curves.jpoint import BN256_G1, Points
from sirius_tpu.fields import gold
from sirius_tpu.fields.limb import ints_to_limbs
from sirius_tpu.ops.commitment import CommitmentKey
from sirius_tpu.ops.msm import best_msm, msm_many

curve = BN256_G1
ck = CommitmentKey.setup(curve, 15, b"msmcheck", use_cache=True)
rng = np.random.default_rng(11)
n = 1 << 15
scalars = [int(x) % curve.fs.p for x in rng.integers(0, 1 << 63, size=n).astype(object)]
scalars = [(s * s * s + 7) % curve.fs.p for s in scalars]
arr = jnp.asarray(ints_to_limbs(scalars))
pts = Points(ck.points.x[:n], ck.points.y[:n], ck.points.z[:n])
host = ck.host_points()[:n]

t0=time.time()
got = best_msm(curve, arr, pts, assume_distinct=True)  # vmem path (n>=16384)
print("vmem msm time(cold):", round(time.time()-t0,1), flush=True)
want = gold.msm(scalars[:2048], host[:2048])
got_small = best_msm(curve, arr[:2048], pts, assume_distinct=True)  # bucket_fused path
assert got_small == want, "bucket_fused vs gold mismatch"
print("bucket_fused matches gold on 2048", flush=True)
# full-size: compare vmem vs native C++ pippenger
from sirius_tpu import native
if native.available():
    want_full = native.native_msm(curve.spec, host, scalars)
    assert got == want_full, f"vmem vs native mismatch"
    print("vmem matches native C++ on 2^15 OK", flush=True)
# msm_many batched check
batch = jnp.stack([arr[:4096], arr[4096:8192]])
many = msm_many(curve, batch, pts, assume_distinct=True)
w0 = native.native_msm(curve.spec, host[:4096], scalars[:4096])
w1 = native.native_msm(curve.spec, host[:4096], scalars[4096:8192])
assert many[0] == w0 and many[1] == w1, "msm_many mismatch"
print("msm_many matches native OK", flush=True)
t0=time.time(); best_msm(curve, arr, pts, assume_distinct=True); print("vmem warm:", round(time.time()-t0,2), flush=True)
print("ALL MSM CHECKS PASSED")
