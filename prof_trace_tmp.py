import numpy as np, jax, jax.numpy as jnp, glob, gzip, json, collections
from wfsim_tpu.config import default_config
from wfsim_tpu.resources.loader import load_config
from wfsim_tpu.models.params import build_params, build_constants
from wfsim_tpu.models.s1 import simulate_s1
from wfsim_tpu.models.s2 import simulate_s2

config = default_config(); resource = load_config(config)
params = build_params(config, resource); const = build_constants(config)
rng = np.random.default_rng(0); key = jax.random.key(0, impl='rbg')
n = 512
base = dict(
    time=jnp.asarray(np.arange(n) % 64 * 30_000, jnp.int32),
    x=jnp.asarray(rng.uniform(-40, 40, n), jnp.float32),
    y=jnp.asarray(rng.uniform(-40, 40, n), jnp.float32),
    z=jnp.asarray(rng.uniform(-90, -10, n), jnp.float32),
    recoil=jnp.full(n, 7, jnp.int32),
    valid=jnp.ones(n, bool),
    truth_row=jnp.asarray(np.arange(n), jnp.int32),
)
inst1 = dict(base, amp=jnp.full(n, 2000, jnp.int32))
inst2 = dict(base, amp=jnp.full(n, 300, jnp.int32))

def sync(o): np.asarray(jax.tree_util.tree_leaves(o)[0].reshape(-1)[:1])
sync(simulate_s1(params, const, inst1, key, capacity=2**21, n_truth_rows=n))
sync(simulate_s2(params, const, inst2, key, e_capacity=2**18, capacity=2**21, n_truth_rows=n))
with jax.profiler.trace('/tmp/jaxtrace3'):
    for _ in range(3):
        sync(simulate_s1(params, const, inst1, key, capacity=2**21, n_truth_rows=n))
        sync(simulate_s2(params, const, inst2, key, e_capacity=2**18, capacity=2**21, n_truth_rows=n))

d = sorted(glob.glob('/tmp/jaxtrace3/plugins/profile/*'))[-1]
with gzip.open(d + '/vm.trace.json.gz') as f:
    tr = json.load(f)
ev = tr['traceEvents']
pids = {e['pid']: e['args'].get('name','') for e in ev if e.get('ph')=='M' and e.get('name')=='process_name'}
dur = collections.Counter(); args = {}
for e in ev:
    if e.get('ph')=='X' and 'TPU' in pids.get(e.get('pid'),'').upper():
        dur[e['name']] += e.get('dur',0)
        a = e.get('args') or {}
        if 'long_name' in a: args[e['name']] = a['long_name'][:120]
for name, dd in dur.most_common(18):
    print(f'{dd/1e3/3:8.2f} ms  {name[:46]:46s} {args.get(name,"")[:100]}')
