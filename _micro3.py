import time, jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/sirius_tpu_xla_cache")
import jax.numpy as jnp
from sirius_tpu.fields.jfield import FR
from sirius_tpu.fields.jfield_lf import lf_for, to_lf, from_lf
from sirius_tpu.nifs.protogalaxy import _pow_weighted_reduce_lf, _pow_coeffs_lf

flf = lf_for(FR)
N = 1 << 17
m = 17
rng = np.random.default_rng(0)
vals = FR.random((N,), rng)
vals_lf = to_lf(vals)
w = FR.random((1, m), rng)  # (t=1, m, L)
w_lf = jnp.moveaxis(w, -1, 0)  # (L, t, m)

def t(name, fn, n=5):
    r = fn(); jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); r = fn(); jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1e3:.1f} ms", flush=True)

# 1. reduce only
red = jax.jit(lambda v, w: _pow_weighted_reduce_lf(flf, v, w))
t("pow_weighted_reduce t=1 N=2^17", lambda: red(vals_lf, w_lf))

# 2. plain elementwise mul over N
mulfn = jax.jit(lambda a, b: flf.mul(a, b))
t("one mul (L,N)", lambda: mulfn(vals_lf, vals_lf))

# 3. sum_reduce only
sr = jax.jit(lambda a: flf.sum_reduce(a, axis=0))
t("sum_reduce (L,N)", lambda: sr(vals_lf))

# 4. coeff build only
cb = jax.jit(lambda w: _pow_coeffs_lf(flf, w, 0, 12))
t("coeff build 12 levels", lambda: cb(w_lf))

# 5. 32-chunk scan of mul+reduce
def scan_fn(v, coeff):
    chunks = jnp.moveaxis(v.reshape(16, 32, 4096), 1, 0)
    def body(c, chunk):
        return c, flf.sum_reduce(flf.mul(chunk[:, None], coeff), axis=1)
    _, tops = jax.lax.scan(body, 0, chunks)
    return tops
sc = jax.jit(scan_fn)
coeff_lo = jax.jit(lambda w: _pow_coeffs_lf(flf, w, 0, 12))(w_lf)
t("scan32(mul+reduce)", lambda: sc(vals_lf, coeff_lo))

# 6. same without scan (batched)
def nos(v, coeff):
    ch = v.reshape(16, 32, 4096)
    return flf.sum_reduce(flf.mul(ch, coeff), axis=1)
t("batched(mul+reduce)", lambda: jax.jit(nos)(vals_lf, coeff_lo))
