"""Full-run device trace of the realistic (noise + afterpulses) workload.

Runs the bench workload once under jax.profiler.trace and aggregates
device-lane time by XLA module (jit_* program), so we can see which
compiled programs actually occupy the chip during a production-shaped run
(vs wall time, which includes tunnel transfers and host work).

Usage: python prof_trace_full.py [n_events] [realistic(0/1)]
"""
import collections
import glob
import gzip
import json
import sys
import time

import numpy as np

from wfsim_tpu.config import default_config
from wfsim_tpu.interface.simulator import Simulator
from bench import _make_inst


def main(n_events=256, realistic=True, ceiling=False):
    if realistic:
        c = default_config(enable_noise=True, enable_pmt_afterpulses=True,
                           enable_electron_afterpulses=True)
    else:
        c = default_config()
    c['chunk_size'] = 100
    c['seed'] = 1234
    if ceiling:
        c['_bench_device_ceiling'] = True
    inst = _make_inst(n_events, 2000, 300)

    sim = Simulator(c)
    _ = sim.get_arrays(inst)          # warmup/compile

    sim = Simulator(c)
    t0 = time.perf_counter()
    with __import__('jax').profiler.trace('/tmp/jaxtrace_full'):
        out = sim.get_arrays(inst)
    dt = time.perf_counter() - t0
    phases = {k: round(v, 3) for k, v in sorted(sim.sim.rawdata.diag.seconds.items())}
    print(json.dumps({'events_per_sec': round(n_events / dt, 2),
                      'total_s': round(dt, 2),
                      'n_records': len(out['raw_records']),
                      'phases': phases}))

    d = sorted(glob.glob('/tmp/jaxtrace_full/plugins/profile/*'))[-1]
    with gzip.open(d + '/vm.trace.json.gz') as f:
        tr = json.load(f)
    ev = tr['traceEvents']
    pids = {e['pid']: e['args'].get('name', '') for e in ev
            if e.get('ph') == 'M' and e.get('name') == 'process_name'}
    mod = collections.Counter()      # device us by module (run_id-stripped)
    nexec = collections.Counter()
    total = 0.0
    for e in ev:
        if e.get('ph') == 'X' and 'TPU' in pids.get(e.get('pid'), '').upper():
            a = e.get('args') or {}
            name = a.get('group_name') or e['name']
            # module rows look like jit_foo(12345...); strip the id
            if '(' in name:
                name = name.split('(')[0]
            if name.startswith('jit_'):
                mod[name] += e.get('dur', 0)
                nexec[name] += 1
                total += e.get('dur', 0)
    print(f'total device module time: {total/1e6:.2f} s of {dt:.2f} s wall')
    for name, us in mod.most_common(24):
        print(f'{us/1e3:9.1f} ms x{nexec[name]:<5d} {name}')

    # device-busy timeline: merge all device-lane X intervals and report
    # busy fraction + the largest idle gaps (program-boundary / host stalls)
    spans = []
    for e in ev:
        if e.get('ph') == 'X' and 'TPU' in pids.get(e.get('pid'), '').upper():
            name = (e.get('args') or {}).get('group_name') or e['name']
            if name.split('(')[0].startswith('jit_'):
                spans.append((e['ts'], e['ts'] + e.get('dur', 0)))
    if spans:
        spans.sort()
        merged = [list(spans[0])]
        for s, t in spans[1:]:
            if s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], t)
            else:
                merged.append([s, t])
        t0_, t1_ = merged[0][0], merged[-1][1]
        busy = sum(b - a for a, b in merged)
        gaps = sorted(((merged[i + 1][0] - merged[i][1], merged[i][1] - t0_)
                       for i in range(len(merged) - 1)), reverse=True)
        print(f'device busy {busy/1e6:.2f} s of {(t1_-t0_)/1e6:.2f} s span '
              f'({100*busy/max(t1_-t0_,1):.0f}%), {len(merged)} busy spans')
        print('top idle gaps (ms @ s-into-span): '
              + ', '.join(f'{g/1e3:.0f}@{at/1e6:.2f}' for g, at in gaps[:12]))


if __name__ == '__main__':
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    r = bool(int(sys.argv[2])) if len(sys.argv) > 2 else True
    ceil = bool(int(sys.argv[3])) if len(sys.argv) > 3 else False
    main(n, r, ceil)
