"""One-shot phase profile of the headline bench workload.

Runs the bench.py instruction set once (after a warmup that compiles all
shapes) and prints the RawDataTPU phase-timer summary, so we can see where
wall time goes: simulate dispatch, digitize dispatch, counts fetch, pack
dispatch, payload fetch, host split.
"""
import json
import time

import numpy as np

from wfsim_tpu.config import default_config
from wfsim_tpu.dtypes import instruction_dtype
from wfsim_tpu.interface.simulator import Simulator


def make_inst(n, amp_s1=2000, amp_s2=300):
    rng = np.random.default_rng(7)
    inst = np.zeros(2 * n, dtype=instruction_dtype)
    inst['event_number'] = np.repeat(np.arange(n), 2)
    inst['type'] = np.tile([1, 2], n)
    inst['time'] = np.repeat((np.arange(n) + 1) * 4_000_000, 2)
    r = np.sqrt(rng.uniform(0, 45 ** 2, n))
    th = rng.uniform(-np.pi, np.pi, n)
    inst['x'] = np.repeat(r * np.cos(th), 2)
    inst['y'] = np.repeat(r * np.sin(th), 2)
    inst['z'] = np.repeat(rng.uniform(-90, -10, n), 2)
    inst['amp'] = np.tile([amp_s1, amp_s2], n)
    inst['recoil'] = 7
    return inst


def main(n_events=512):
    c = default_config()
    c['chunk_size'] = 100
    c['seed'] = 1234
    inst = make_inst(n_events)

    sim = Simulator(c)
    _ = sim.get_arrays(inst)          # warmup/compile

    sim = Simulator(c)
    t0 = time.perf_counter()
    out = sim.get_arrays(inst)
    dt = time.perf_counter() - t0
    summ = sim.sim.rawdata.diag.summary()
    print(json.dumps({
        'events_per_sec': round(n_events / dt, 2),
        'total_s': round(dt, 2),
        'n_records': len(out['raw_records']),
        **summ,
    }, indent=1))


if __name__ == '__main__':
    main()
