"""Per-op device trace of gather_digitize + pack at REAL bench shapes.

Runs the bench workload once with gather_digitize monkeypatched to capture
the arguments of the largest digitize call, then re-executes that exact
call (gather + accumulate-pack, as _pack_digitize drives it) under
jax.profiler.trace and prints per-op device time grouped by HLO op name.

Usage: python prof_trace_dig2.py [n_events] [realistic(0/1)]
"""
import collections
import glob
import gzip
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

from wfsim_tpu.config import default_config
from wfsim_tpu.interface.simulator import Simulator
from bench import _make_inst
import wfsim_tpu.pipeline.digitize as dg
import wfsim_tpu.pipeline.rawdata as rd


def main(n_events=256, realistic=False):
    if realistic:
        c = default_config(enable_noise=True, enable_pmt_afterpulses=True,
                           enable_electron_afterpulses=True)
    else:
        c = default_config()
    c['chunk_size'] = 100
    c['seed'] = 1234
    inst = _make_inst(n_events, 2000, 300)

    captured = {}
    orig_gather = dg.gather_digitize

    def spy(params, const, at, ac, ag, pieces, nix, **kw):
        res = orig_gather(params, const, at, ac, ag, pieces, nix, **kw)
        key = int(np.asarray(pieces)[:, :, 1].sum())   # total photons
        if captured.get('score', -1) < key:
            captured.update(score=key, args=(at, ac, ag, pieces, nix),
                            kw=dict(kw))
        return res

    dg.gather_digitize = spy
    try:
        sim = Simulator(c)
        _ = sim.get_arrays(inst)
    finally:
        dg.gather_digitize = orig_gather

    at, ac, ag, pieces, nix = captured['args']
    kw = captured['kw']
    print(json.dumps({'B': int(pieces.shape[0]), **{k: v for k, v in kw.items()}}))

    baseline = int(c['digitizer_reference_baseline'])

    def run_once():
        res = orig_gather(None or sim.sim.rawdata.params,
                          sim.sim.rawdata.const, at, ac, ag, pieces, nix,
                          **kw)
        n_rec = int(res['n_records'])
        n_val = int(res['n_values'])
        n_itv = int(res['n_intervals'])
        mr = rd._bucket(max(n_rec, 1), lo=1024, hi=2 ** 28)
        mv = rd._bucket(max(n_val, 1), lo=4096, hi=2 ** 28)
        n, nv = max(n_rec, 1), max(n_val, 1)
        ne_bound = min(nv // 256 + 512, nv)
        me_bound = min(int(n * 0.25) + 64, n)
        w_meta = 2 if (pieces.shape[0] <= 128 and kw['n_samples'] <= 8192) else 4
        lens = (max(n_itv, 1) * w_meta, n, me_bound, nv, ne_bound)
        full = (mr * w_meta, mr, mr, mv, dg.esc_capacity(mv))
        sz = [rd._bucket(lens[k] + full[k], lo=256, hi=2 ** 30)
              for k in range(5)]
        state = (jnp.zeros(sz[0], jnp.int32),
                 jnp.zeros((sz[1], 4), jnp.uint8),
                 jnp.zeros((sz[2], 14), jnp.uint8),
                 jnp.zeros(sz[3], jnp.int8),
                 jnp.zeros(sz[4], jnp.int16))
        offs = jnp.zeros(5, jnp.int32)
        out = dg.pack_records_accumulate(
            *state, offs, res['data'], res['left_all'], res['starts'],
            res['ends'], res['itv_valid'],
            n_channels_total=int(res['data'].shape[1]),
            n_samples=kw['n_samples'], max_intervals=kw['max_intervals'],
            max_records=mr, max_values=mv, baseline=baseline)
        np.asarray(out[3][-1:])
        return dict(n_rec=n_rec, n_val=n_val, n_itv=n_itv, mr=mr, mv=mv)

    info = run_once()   # warmup any fresh shapes
    print(json.dumps(info))
    with jax.profiler.trace('/tmp/jaxtrace_dig2'):
        for _ in range(3):
            run_once()

    d = sorted(glob.glob('/tmp/jaxtrace_dig2/plugins/profile/*'))[-1]
    with gzip.open(d + '/vm.trace.json.gz') as f:
        tr = json.load(f)
    ev = tr['traceEvents']
    pids = {e['pid']: e['args'].get('name', '') for e in ev
            if e.get('ph') == 'M' and e.get('name') == 'process_name'}
    mods = []     # (start, end, name) module-level rows
    ops = []      # (start, dur, full_name)
    for e in ev:
        if e.get('ph') == 'X' and 'TPU' in pids.get(e.get('pid'), '').upper():
            nm = e['name']
            if nm.split('(')[0].startswith('jit_'):
                mods.append((e['ts'], e['ts'] + e.get('dur', 0),
                             nm.split('(')[0]))
            else:
                ops.append((e['ts'], e.get('dur', 0), nm))
    mods.sort()
    per_mod = collections.defaultdict(collections.Counter)
    mod_tot = collections.Counter()
    import bisect
    for ts, dur, nm in ops:
        i = bisect.bisect_right([m[0] for m in mods], ts) - 1
        mod = mods[i][2] if 0 <= i < len(mods) and ts < mods[i][1] else '?'
        per_mod[mod][nm] += dur
        mod_tot[mod] += dur
    for mod, tot in mod_tot.most_common(4):
        print(f'== {mod}: {tot/3e3:.1f} ms/call (op-sum) ==')
        for op, us in per_mod[mod].most_common(20):
            print(f'  {us/3e3:8.2f} ms  {op}')


if __name__ == '__main__':
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    r = bool(int(sys.argv[2])) if len(sys.argv) > 2 else False
    main(n, r)
