import os, time
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8 ' + os.environ.get('XLA_FLAGS','')
import jax
jax.config.update('jax_platforms', 'cpu')
t0 = time.time()
import __graft_entry__ as g
g.dryrun_multichip(8)
print('DRYRUN OK', round(time.time()-t0,1), flush=True)
