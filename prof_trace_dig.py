"""Per-op device trace of gather_digitize + pack_records_encoded (bench-like
shapes, reusing profile_stages' compiled programs)."""
import collections
import glob
import gzip
import json

import numpy as np
import jax
import jax.numpy as jnp

from wfsim_tpu.config import default_config
from wfsim_tpu.resources.loader import load_config
from wfsim_tpu.models.params import build_params, build_constants
from wfsim_tpu.pipeline.digitize import gather_digitize, pack_records_encoded

config = default_config()
resource = load_config(config)
params = build_params(config, resource)
const = build_constants(config)
rng = np.random.default_rng(0)
key = jax.random.key(0, impl='rbg')

A = 2 ** 20
arena_t = jnp.asarray(rng.integers(0, 60000, A), jnp.int32)
arena_ch = jnp.asarray(rng.integers(0, 494, A), jnp.int32)
arena_g = jnp.asarray(rng.uniform(1e6, 3e6, A), jnp.float32)

B, T, npp = 64, 1024, 160
pieces = np.zeros((B, 4, 3), np.int32)
for b in range(B):
    pieces[b, 0] = (b * npp, npp, 0)
n_cap = 1 << int(np.ceil(np.log2(npp + 1)))


def run():
    res = gather_digitize(params, const, arena_t, arena_ch, arena_g,
                          jnp.asarray(pieces), jnp.zeros(B, jnp.int32),
                          n_samples=T, n_pieces=4, n_cap=n_cap,
                          max_intervals=64)
    n_rec = int(res['n_records'])
    n_val = int(res['n_values'])
    mr = 1 << int(np.ceil(np.log2(max(n_rec, 2))))
    mv = 1 << int(np.ceil(np.log2(max(n_val, 2))))
    packed = pack_records_encoded(
        res['data'], res['left_all'], res['starts'], res['ends'],
        res['itv_valid'], n_channels_total=int(res['data'].shape[1]),
        n_samples=T, max_intervals=64, max_records=mr, max_values=mv,
        baseline=int(config['digitizer_reference_baseline']))
    np.asarray(packed['itv_meta'][:1])
    return res, packed


run()          # warmup
with jax.profiler.trace('/tmp/jaxtrace_dig'):
    for _ in range(3):
        run()

d = sorted(glob.glob('/tmp/jaxtrace_dig/plugins/profile/*'))[-1]
with gzip.open(d + '/vm.trace.json.gz') as f:
    tr = json.load(f)
ev = tr['traceEvents']
pids = {e['pid']: e['args'].get('name', '') for e in ev
        if e.get('ph') == 'M' and e.get('name') == 'process_name'}
dur = collections.Counter()
args = {}
for e in ev:
    if e.get('ph') == 'X' and 'TPU' in pids.get(e.get('pid'), '').upper():
        dur[e['name']] += e.get('dur', 0)
        a = e.get('args') or {}
        if 'long_name' in a:
            args[e['name']] = a['long_name'][:140]
for name, dd in dur.most_common(20):
    print(f'{dd/1e3/3:8.2f} ms  {name[:42]:42s} {args.get(name, "")[:110]}')
