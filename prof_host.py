import cProfile, pstats, io, time
import numpy as np
from wfsim_tpu.config import default_config
from wfsim_tpu.interface.simulator import Simulator
from bench import _make_inst

c = default_config(enable_noise=True, enable_pmt_afterpulses=True,
                   enable_electron_afterpulses=True)
c['chunk_size'] = 100
c['seed'] = 1234
inst = _make_inst(512, 2000, 300)
sim = Simulator(c)
_ = sim.get_arrays(inst)   # warmup
sim = Simulator(c)
pr = cProfile.Profile()
t0 = time.perf_counter()
pr.enable()
_ = sim.get_arrays(inst)
pr.disable()
print('wall', round(time.perf_counter()-t0, 2))
s = io.StringIO()
ps = pstats.Stats(pr, stream=s).sort_stats('cumulative')
ps.print_stats(45)
print(s.getvalue())
