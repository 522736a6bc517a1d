"""Quick headline + realistic phase measurement (2 runs each after warmup).

Lighter than bench.py (no CPU baseline, no kernel A/B): used mid-round to
check whether a device/pipeline change moved the TPU wall, with the same
workload and phase timers as the official bench.
"""
import json
import sys
import time

import numpy as np

from wfsim_tpu.config import default_config
from wfsim_tpu.interface.simulator import Simulator
from bench import _make_inst


def run(realistic, n_events=512, repeats=2):
    if realistic:
        c = default_config(enable_noise=True, enable_pmt_afterpulses=True,
                           enable_electron_afterpulses=True)
    else:
        c = default_config()
    c['chunk_size'] = 100
    c['seed'] = 1234
    inst = _make_inst(n_events, 2000, 300)
    sim = Simulator(c)
    _ = sim.get_arrays(inst)          # warmup/compile
    for i in range(repeats):
        sim = Simulator(c)
        t0 = time.perf_counter()
        _ = sim.get_arrays(inst)
        dt = time.perf_counter() - t0
        diag = sim.sim.rawdata.diag
        ph = {k: round(v, 3) for k, v in sorted(diag.seconds.items())}
        pb = {k: int(v) for k, v in sorted(diag.counts.items())
              if 'payload' in k}
        print(json.dumps({'realistic': realistic, 'run': i,
                          'ev_per_s': round(n_events / dt, 1),
                          'seconds': round(dt, 2), 'phases': ph,
                          'payload': pb}),
              flush=True)


if __name__ == '__main__':
    which = sys.argv[1] if len(sys.argv) > 1 else 'both'
    if which in ('both', 'real'):
        run(True)
    if which in ('both', 'head'):
        run(False)
