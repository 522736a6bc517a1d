"""One-off A/B: pipeline_depth effect on headline + realistic walls."""
import json
import sys
import time

from wfsim_tpu.config import default_config
from wfsim_tpu.interface.simulator import Simulator
from bench import _make_inst


def run(realistic, depth, n_events=512, repeats=2, warm=None):
    if realistic:
        c = default_config(enable_noise=True, enable_pmt_afterpulses=True,
                           enable_electron_afterpulses=True)
    else:
        c = default_config()
    c['chunk_size'] = 100
    c['seed'] = 1234
    c['pipeline_depth'] = depth
    inst = _make_inst(n_events, 2000, 300)
    if warm:
        sim = Simulator(c)
        _ = sim.get_arrays(inst)
    for i in range(repeats):
        sim = Simulator(c)
        t0 = time.perf_counter()
        _ = sim.get_arrays(inst)
        dt = time.perf_counter() - t0
        ph = {k: round(v, 3) for k, v in
              sorted(sim.sim.rawdata.diag.seconds.items()) if v > 0.15}
        print(json.dumps({'realistic': realistic, 'depth': depth, 'run': i,
                          'ev_per_s': round(n_events / dt, 1),
                          'seconds': round(dt, 2), 'phases': ph}),
              flush=True)


if __name__ == '__main__':
    for j, d in enumerate(int(x) for x in sys.argv[2:]):
        run(sys.argv[1] == 'real', d, warm=(j == 0))
