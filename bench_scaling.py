"""Batch-size scaling study (BENCH_NOTES round-3 table).

Runs the headline (no-noise) and realistic (noise + afterpulses) configs at
512/1024/2048/4096-event batches and prints one JSON line per point, so the
saturating term (device compute vs wire vs fixed dispatch cost) can be read
off the phase breakdown.  Run on the real TPU: ``python bench_scaling.py``;
pass --quick for the 512/1024 subset.
"""
import json
import sys
import time

import numpy as np

from bench import _make_inst


def run_point(n_events, realistic, repeats=2):
    from wfsim_tpu.config import default_config
    from wfsim_tpu.interface.simulator import Simulator

    if realistic:
        c = default_config(enable_noise=True, enable_pmt_afterpulses=True,
                           enable_electron_afterpulses=True)
    else:
        c = default_config()
    c['chunk_size'] = 1000
    c['seed'] = 1234
    inst = _make_inst(n_events, 2000, 300)
    sim = Simulator(c)
    _ = sim.get_arrays(inst)      # warmup/compile
    best = None
    for _ in range(repeats):
        sim = Simulator(c)
        t0 = time.perf_counter()
        out = sim.get_arrays(inst)
        dt = time.perf_counter() - t0
        if best is None or dt < best[0]:
            best = (dt, sim.sim.rawdata.diag, out)
    dt, diag, out = best
    phases = {k: round(v, 3) for k, v in sorted(diag.seconds.items())}
    phases['payload_bytes'] = int(diag.counts.get('payload_bytes', 0))
    print(json.dumps({
        'config': 'realistic' if realistic else 'headline',
        'n_events': n_events,
        'events_per_sec': round(n_events / dt, 1),
        'photons_per_sec': round(int(out['truth']['n_photon'].sum()) / dt, 1),
        'seconds': round(dt, 2),
        'device_phases': phases,
    }), flush=True)


def main():
    sizes = (512, 1024) if '--quick' in sys.argv else (512, 1024, 2048, 4096)
    for realistic in (False, True):
        for n in sizes:
            try:
                run_point(n, realistic)
            except Exception as e:   # OOM guard: report and continue
                print(json.dumps({'config': 'realistic' if realistic
                                  else 'headline', 'n_events': n,
                                  'error': repr(e)[:200]}), flush=True)


if __name__ == '__main__':
    main()
