import time, jax, sys
jax.config.update("jax_compilation_cache_dir", "/tmp/sirius_tpu_xla_cache")
import jax.numpy as jnp
from sirius_tpu.curves.jpoint import BN256_G1, GRUMPKIN
from sirius_tpu.ivc.cyclefold_ivc import SUPPORT_K, CyclefoldIVC, CyclefoldPublicParams
from sirius_tpu.ivc.step_circuit import TrivialStepCircuit
from sirius_tpu.ops.commitment import CommitmentKey
from sirius_tpu.nifs import protogalaxy as pg

k, key_k = 17, 20
ck1 = CommitmentKey.setup(BN256_G1, key_k, b"bench-primary", use_cache=True)
ck2 = CommitmentKey.setup(GRUMPKIN, SUPPORT_K + 3, b"bench-support", use_cache=True)
pp = CyclefoldPublicParams(TrivialStepCircuit(arity=1), k=k, ck_primary=ck1, ck_support=ck2)
ivc = CyclefoldIVC(pp, [0x42])
print("new done", flush=True)
ivc.next()
print("next done", flush=True)
acc = ivc.self_acc
S = pp.S_primary

def t(name, fn, n=3):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); r = fn()
        if hasattr(r, "block_until_ready"): r.block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1e3:.1f} ms", flush=True)
    return r

# 1. full e-from-trace (accumulation check)
t("evaluate_e_from_trace", lambda: pg.evaluate_e_from_trace(S, acc.trace, acc.betas), n=2)

# 2. raw gate sweep: evaluate all gates limb-first, jitted
from sirius_tpu.plonk.eval import PlonkEvalDomain
f = S.field
challenges = [f.encode([c % f.p])[0] for c in acc.trace.u.challenges]
import jax as _j
@_j.jit
def sweep(sel, fixed, chs, Ws):
    dom = PlonkEvalDomain.__new__(PlonkEvalDomain)
    dom.S = S; dom.challenges = chs; dom.W1s = Ws; dom.W2s = []
    dom._sel_override = sel; dom._fixed_override = fixed
    outs = dom.evaluate_lf(S.gates)
    return jnp.stack([o for o in outs])
sel = jnp.asarray(S.selectors_device); fixed = jnp.asarray(S.fixed_device)
Ws = list(acc.trace.w.W)
t("gate_sweep_all_gates", lambda: sweep(sel, fixed, challenges, Ws))
print("num gates:", len(S.gates), "n:", S.n, "advice cols:", S.num_advice_columns, flush=True)

# 3. compute_F warm
ctx = pg.PolyContext(S, 1)
t("compute_F", lambda: pg.compute_F(ctx, acc.betas, 12345, acc.trace), n=2)
print("F points:", ctx.fft_points_count_F, "G points:", ctx.fft_points_count_G, "betas:", ctx.betas_count, flush=True)

# 4. compute_G warm
t("compute_G", lambda: pg.compute_G(ctx, acc.betas, acc.trace, [ivc.primary_trace]), n=2)
