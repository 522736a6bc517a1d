"""Waveform fidelity: the digitized pulses must reproduce the photon-level
truth (areas and timing moments), closing the loop between the Monte Carlo
and the DAQ chain — this is the statistical-equivalence acceptance approach
from SURVEY s4 (no bitwise RNG match is possible or required)."""
import numpy as np
import pytest

from wfsim_tpu.config import default_config
from wfsim_tpu.dtypes import instruction_dtype
from wfsim_tpu.interface.simulator import Simulator


@pytest.fixture(scope='module')
def s1_run():
    c = default_config()
    c['seed'] = 21
    inst = np.zeros(6, dtype=instruction_dtype)
    inst['type'] = 1
    inst['event_number'] = np.arange(6)
    inst['time'] = (np.arange(6) + 1) * 50_000_000
    inst['x'], inst['y'], inst['z'] = 10., 0., -50.
    inst['amp'] = 300000     # ~2000 detected photons/event: sigma estimates
    inst['recoil'] = 7       # fluctuate ~1%, so the moment bands can be tight
    sim = Simulator(c)
    out = sim.get_arrays(inst)
    return c, out


def _pulse_moments(rr, baseline):
    """ADC-area-weighted time mean/std over all records."""
    w_sum = 0.0
    t_sum = 0.0
    t2_sum = 0.0
    for rec in rr:
        d = rec['data'][:rec['length']].astype(np.float64)
        amp = np.clip(baseline - d, 0, None)
        ts = rec['time'] + 10.0 * np.arange(rec['length'])
        w_sum += amp.sum()
        t_sum += (amp * ts).sum()
        t2_sum += (amp * ts * ts).sum()
    mean = t_sum / w_sum
    var = t2_sum / w_sum - mean ** 2
    return mean, np.sqrt(max(var, 0))


def _template_moments(c):
    """Exact charge-weighted time centroid/variance of the SPE template
    bank relative to the photon arrival time (phase-averaged): a photon at
    time t with r = t % 10 contributes template[r][k] at time
    t - r + 10k .. +10 (bin center 10k + 5 - r)."""
    from wfsim_tpu.ops.waveform import make_templates
    tm = make_templates(c['pe_pulse_ts'], c['pe_pulse_ys'])
    means, raw2 = [], []
    for r in range(tm.shape[0]):
        w = tm[r] / tm[r].sum()
        p = 10.0 * np.arange(tm.shape[1]) + 5.0 - r
        m = float((w * p).sum())
        means.append(m)
        raw2.append(float((w * p * p).sum()))
    centroid = np.mean(means)
    var = np.mean(raw2) - centroid ** 2
    return centroid, var


def test_s1_waveform_moments_match_truth(s1_run):
    c, out = s1_run
    rr, truth = out['raw_records'], out['truth']
    assert len(truth) == 6
    centroid, t_var = _template_moments(c)
    excess = []
    for ev in range(6):
        sel = rr[(rr['time'] >= truth['time'][ev] - 10000)
                 & (rr['time'] <= truth['time'][ev] + 100000)]
        mean, std = _pulse_moments(sel, c['digitizer_reference_baseline'])
        # waveform mean = truth photon mean (post-TTS, like the reference's
        # add_truth) + the exact template centroid
        offset = mean - truth['t_mean_photon'][ev]
        assert abs(offset - centroid) < 15, (offset, centroid)
        # width: photon-time sigma convolved with the exact template width
        expect = np.sqrt(truth['t_sigma_photon'][ev] ** 2 + t_var)
        assert abs(std - expect) < 0.08 * expect, (std, expect)
        excess.append(std ** 2 - truth['t_sigma_photon'][ev] ** 2)
    # pooled: the variance the DAQ adds on top of the photon times must be
    # the template's second moment (gain weighting and ADC rounding make
    # single events noisy; the 6-event mean pins it within ~20%)
    assert abs(np.mean(excess) - t_var) < 0.35 * t_var, \
        (np.mean(excess), t_var)


def test_s1_area_vs_npe(s1_run):
    """Total pulse area in PE (area / (gain*c2adc/dt)) must match truth n_pe
    within ZLE losses."""
    c, out = s1_run
    rr, truth = out['raw_records'], out['truth']
    baseline = c['digitizer_reference_baseline']
    area_adc = 0.0
    for rec in rr:
        d = rec['data'][:rec['length']].astype(np.float64)
        area_adc += np.clip(baseline - d, 0, None).sum()
    gain = np.asarray(c['gains']).mean()
    adc_per_pe = gain * c['current_2_adc'] / c['sample_duration']
    n_pe_measured = area_adc / adc_per_pe
    n_pe_truth = truth['raw_area'].sum()
    assert abs(n_pe_measured - n_pe_truth) / n_pe_truth < 0.05
