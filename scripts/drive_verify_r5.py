"""Round-5 /verify driver: drive the library end-to-end through its public
API on CPU — Sangria NIFS 2-step fold round-trip with corruption probes,
plus a direct bit-exactness check of the NEW interpolation-based cross-term
path against the OLD symbolic grouped-poly evaluation."""
import sys, os
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import jax
jax.config.update("jax_platforms", "cpu")
from sirius_tpu.util.cache import setup_compile_cache
setup_compile_cache()

from sirius_tpu.fields import gold
from sirius_tpu.fields.constants import bn256_fq, bn256_fr, bn256_g1
from sirius_tpu.frontend.runner import CircuitRunner
from sirius_tpu.nifs.sangria import (RelaxedPlonkInstance, RelaxedPlonkTrace,
                                     RelaxedPlonkWitness, VanillaFS)
from sirius_tpu.ops.commitment import CommitmentKey
from sirius_tpu.ops.poseidon import PoseidonHash, poseidon_spec
from sirius_tpu.curves.jpoint import BN256_G1
from sirius_tpu.plonk.sps import run_sps_protocol
from sirius_tpu.plonk.eval import PlonkEvalDomain
from fixtures import SquareCircuit

K = 4
p = bn256_fr.modulus
ck = CommitmentKey.setup(BN256_G1, 7, b"sangria-test", use_cache=True, window_bits=4)

def ro():
    return PoseidonHash(poseidon_spec(bn256_fq, 3, 2, 4, 3))

c1, c2, c3 = SquareCircuit(3, 6), SquareCircuit(5, 6), SquareCircuit(7, 6)
i1, i2, i3 = (c.instances(p) for c in (c1, c2, c3))
r1 = CircuitRunner(K, bn256_fr, c1, i1)
S = r1.collect_plonk_structure()
W1 = r1.collect_witness()
W2 = CircuitRunner(K, bn256_fr, c2, i2).collect_witness()
W3 = CircuitRunner(K, bn256_fr, c3, i3).collect_witness()
shared = ro()
tr1 = run_sps_protocol(S, ck, i1, W1, shared)
tr2 = run_sps_protocol(S, ck, i2, W2, shared)
tr3 = run_sps_protocol(S, ck, i3, W3, shared)
print("[1] SPS traces generated", flush=True)

# --- bit-exactness: interpolated cross terms == symbolic grouped terms ---
curve = bn256_g1
pp, vp = VanillaFS.setup_params(gold.identity(BN256_G1), S)
accU = RelaxedPlonkInstance.from_instance(curve, tr1.u)
accW = RelaxedPlonkWitness.from_regular(tr1.w, S.k, S.field)
f = S.field
cross, commits = VanillaFS.commit_cross_terms(ck, S, accU, accW, tr2.u, tr2.w)
terms = list(S.custom_gates_lookup_compressed.grouped.iter_from_first())
challenges = [*accU.challenges, accU.u, *tr2.u.challenges, 1]
dom = PlonkEvalDomain(S, challenges=[f.encode([c % p])[0] for c in challenges],
                      W1s=list(accW.W), W2s=list(tr2.w.W))
sym = dom.evaluate([t for t in terms if t is not None])
it = iter(sym)
import numpy as np
for k, t in enumerate(terms):
    want = next(it) if t is not None else f.zeros((S.n,))
    got = cross[k]
    assert np.array_equal(np.asarray(got), np.asarray(want)), f"T_{k+1} mismatch"
print(f"[2] {len(cross)} interpolated cross-terms bit-exact vs symbolic grouped terms", flush=True)

# --- 2-step fold: prover vs verifier accumulator equality + is_sat ---
ro_p, ro_v = ro(), ro()
ro_nark_v = ro()
from sirius_tpu.plonk.sps import sps_verify
sps_verify(tr1.u, ro_nark_v)  # replay tr1 on the shared SPS transcript
acc = RelaxedPlonkTrace(accU.clone(), RelaxedPlonkWitness(list(accW.W), accW.E))
accV = accU.clone()
insts = [i1]
for trc, ii in ((tr2, i2), (tr3, i3)):
    acc, commits = VanillaFS.prove(ck, pp, ro_p, acc, trc)
    accV = VanillaFS.verify(vp, curve, ro_nark_v, ro_v, accV, trc.u, commits)
    insts.append(ii)
    assert acc.U.consistency_markers == accV.consistency_markers
    assert acc.U.u == accV.u and acc.U.challenges == accV.challenges
    assert acc.U.E_commitment == accV.E_commitment
    assert all(a == b for a, b in zip(acc.U.W_commitments, accV.W_commitments))
    errs = VanillaFS.is_sat(ck, S, acc, insts)
    assert not errs, errs
print("[3] 2-step fold: prover==verifier accumulators, is_sat clean", flush=True)

# --- corruption probes ---
bad = RelaxedPlonkTrace(acc.U.clone(), RelaxedPlonkWitness(list(acc.W.W), acc.W.E))
Wc = np.asarray(bad.W.W[0]).copy()
Wc[5] = (Wc[5] + 1) % (1 << 16)
import jax.numpy as jnp
bad.W.W[0] = jnp.asarray(Wc)
errs = VanillaFS.is_sat(ck, S, bad, insts)
assert errs, "corrupted witness must fail is_sat"
print(f"[4] witness corruption detected: {[type(e).__name__ for e in errs]}", flush=True)

bad_commits = [commits[0].mul(2), *commits[1:]]
def refold(cms):
    ro_nark_b = ro()
    sps_verify(tr1.u, ro_nark_b); sps_verify(tr2.u, ro_nark_b)
    return VanillaFS.verify(vp, curve, ro_nark_b, ro(), accV.clone(), tr3.u, cms)
good, badf = refold(commits), refold(bad_commits)
# tampered T commits must diverge the folded accumulator
assert badf.E_commitment != good.E_commitment
print("[5] tampered cross-term commitment diverges verifier accumulator", flush=True)
print("VERIFY-OK", flush=True)
