"""CPU pre-check: can the production H=16/k=18 spread-SHA256 step build its
CyclefoldPublicParams (SFC shape fits the table) and complete new()+next()?"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
from sirius_tpu.util.cache import setup_compile_cache
setup_compile_cache()
from sirius_tpu.fields.constants import bn256_fr
from sirius_tpu.curves.jpoint import BN256_G1, GRUMPKIN
from sirius_tpu.util.testing import MockCommitmentKey
from sirius_tpu.gadgets.spread_sha256 import SpreadSha256StepCircuit
from sirius_tpu.ivc.cyclefold_ivc import CyclefoldIVC, CyclefoldPublicParams

t0 = time.time()
sc = SpreadSha256StepCircuit(bn256_fr, half_bits=16)
pp = CyclefoldPublicParams(sc, k=18, ck_primary=MockCommitmentKey(BN256_G1), ck_support=MockCommitmentKey(GRUMPKIN))
print(f"pp built {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
ivc = CyclefoldIVC(pp, [0x42])
print(f"new {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
ivc.next()
print(f"next {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
errs = ivc.verify()
print(f"verify {time.time()-t0:.1f}s errs={errs}", flush=True)
assert not errs
print("SHA256-PRECHECK-OK", flush=True)
