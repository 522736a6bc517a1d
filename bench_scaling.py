"""Ceiling-mode batch-size scaling study (round-4 verdict item 5).

The r4 wire-mode table was wire-polluted (±8%); ceiling mode has 0.3%
spread, so size differences are real.  One JSON line per (config, size).

Usage: python bench_scaling.py [sizes...]   (default 512 1024 2048)
"""
import json
import sys
import time

import numpy as np

from wfsim_tpu.config import default_config
from wfsim_tpu.interface.simulator import Simulator
from bench import _make_inst


def run(realistic, n_events, repeats=3):
    if realistic:
        c = default_config(enable_noise=True, enable_pmt_afterpulses=True,
                           enable_electron_afterpulses=True)
    else:
        c = default_config()
    c['chunk_size'] = 100
    c['seed'] = 1234
    c['_bench_device_ceiling'] = True
    inst = _make_inst(n_events, 2000, 300)
    sim = Simulator(c)
    sim.get_arrays(inst)
    sim = Simulator(c)
    sim.get_arrays(inst)
    ts = []
    for _ in range(repeats):
        sim = Simulator(c)
        t0 = time.perf_counter()
        sim.get_arrays(inst)
        ts.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({
        'config': 'realistic' if realistic else 'headline',
        'n_events': n_events,
        'ceiling_ev_s': round(n_events / float(np.median(ts)), 1),
        'runs': ts}), flush=True)


if __name__ == '__main__':
    sizes = [int(a) for a in sys.argv[1:]] or [512, 1024, 2048]
    for n in sizes:
        for realistic in (False, True):
            run(realistic, n)
