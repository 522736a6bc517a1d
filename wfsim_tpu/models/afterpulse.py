"""Afterpulse models.

1. PMT afterpulses (device): per incident photon, per ion species, a uniform
   draw against the channel's delay-time CDF selects afterpulse photons;
   delay and amplitude come from CDF inversions (reference:
   wfsim/core/afterpulse.py:143-249).  Computed batched over all photons and
   species; selected photons are compacted (stable, grouped by instruction)
   into a fixed-capacity buffer.

2. Electron afterpulses (host+device): photoionization (pi_el, type 4) and
   gate photoelectric (pe_el, type 6) emit *new instructions* that re-enter
   the scheduling queue (reference: afterpulse.py:14-139).  The device
   provides per-instruction photon counts and candidate time-zeros; the
   (tiny) instruction synthesis happens on host.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['pmt_afterpulse_photons', 'photon_summaries',
           'generate_pi_el_instructions', 'generate_pe_el_instructions',
           'reduce_instruction_timing']


def _argmin_abs_monotone(rows, row_idx, r):
    """index minimizing |rows[row_idx, i] - r| for nondecreasing rows —
    the vectorized equivalent of the reference's dense
    ``np.argmin(np.abs(cdf - rU[:, None]), axis=-1)`` lookups
    (afterpulse.py:219-233), via binary search instead of an (N, T) matrix."""
    R = rows.shape[-1]
    lo = jnp.zeros(r.shape, jnp.int32)
    hi = jnp.full(r.shape, R - 1, jnp.int32)
    for _ in range(int(np.ceil(np.log2(max(R, 2)))) + 1):
        mid = (lo + hi) // 2
        go_right = rows[row_idx, mid] < r
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    i1 = jnp.clip(lo, 0, R - 1)
    i0 = jnp.clip(i1 - 1, 0, R - 1)
    pick_lo = jnp.abs(rows[row_idx, i0] - r) <= jnp.abs(rows[row_idx, i1] - r)
    return jnp.where(pick_lo, i0, i1)


@partial(jax.jit, static_argnames=('const', 'ap_capacity', 'n_truth_rows'))
def pmt_afterpulse_photons(params, const, photons, key, *, ap_capacity: int,
                           n_truth_rows: int = 0):
    """Generate PMT afterpulse photons from a primary photon batch.

    :param photons: dict from pmt_response (t, ch, is_dpe, valid, truth_row)
    :returns: photon dict with preset gains (t, ch, gain, valid, truth_row),
        compacted to ``ap_capacity`` slots grouped by truth_row, plus the
        total count.
    """
    n = photons['t'].shape[0]
    n_elements = params.pmt_ap_delay_cdf.shape[0]
    ch = jnp.clip(photons['ch'], 0, params.gains.shape[0] - 1)

    all_t, all_ch, all_gain, all_sel, all_row = [], [], [], [], []
    for e in range(n_elements):
        k0, k1, k2, key = jax.random.split(key, 4)
        delay_cdf = params.pmt_ap_delay_cdf[e]
        amp_cdf = params.pmt_ap_amp_cdf[e]
        rU0 = 1.0 - jax.random.uniform(k0, (n,))
        rU0 = rU0 / const.pmt_ap_modifier
        rU0 = jnp.where(photons['is_dpe'], rU0 / 2.0, rU0)
        prob_ap = delay_cdf[ch, -1]
        sel = photons['valid'] & (rU0 <= prob_ap)

        if const.pmt_ap_element_uniform[e]:
            u = jax.random.uniform(k1, (n,))
            lo, hi = delay_cdf[ch, 0], delay_cdf[ch, 1]
            ap_delay = (lo + u * (hi - lo)) * const.pmt_ap_delay_bin[e]
            ap_amp = jnp.ones(n, jnp.float32)
        else:
            idx = _argmin_abs_monotone(delay_cdf, ch, rU0)
            ap_delay = (idx.astype(jnp.float32) * const.pmt_ap_delay_bin[e]
                        - const.pmt_ap_t_modifier)
            rU1 = 1.0 - jax.random.uniform(k2, (n,))
            aidx = _argmin_abs_monotone(amp_cdf, ch, rU1)
            ap_amp = aidx.astype(jnp.float32) * const.pmt_ap_amp_bin[e]

        all_t.append(photons['t'] + ap_delay.astype(jnp.int32))
        all_ch.append(photons['ch'])
        all_gain.append(params.gains[ch] * ap_amp)
        all_sel.append(sel & (ap_amp > 0))
        all_row.append(photons['truth_row'])

    t = jnp.concatenate(all_t)
    chs = jnp.concatenate(all_ch)
    gain = jnp.concatenate(all_gain)
    sel = jnp.concatenate(all_sel)
    row = jnp.concatenate(all_row)

    # Compact selected AP photons, keeping them grouped by truth_row so the
    # digitizer can gather contiguous per-group ranges.  Two stages, neither
    # sorting the full n_elements*n axis (a 1.8M-slot stable argsort was
    # this kernel's dominant device cost): (1) compact the selected photons
    # in flat element-major order via cumsum + boundary search; (2) group
    # the ap_capacity survivors by truth_row with a small stable argsort.
    # Both stages preserve flat order within a row, so the output is
    # bitwise identical to the single big argsort whenever total fits
    # ap_capacity (overflowing calls are regenerated larger by the caller).
    pos = jnp.cumsum(sel.astype(jnp.int32))
    total = pos[-1]
    take1 = jnp.searchsorted(
        pos, jnp.arange(1, ap_capacity + 1, dtype=jnp.int32))
    take1 = jnp.clip(take1, 0, sel.shape[0] - 1)
    valid1 = jnp.arange(ap_capacity, dtype=jnp.int32) < total
    t1, ch1, g1, row1 = t[take1], chs[take1], gain[take1], row[take1]
    order = jnp.argsort(jnp.where(valid1, row1, jnp.int32(2 ** 30)),
                        stable=True)
    valid_o = valid1[order]
    out = dict(t=t1[order], ch=jnp.where(valid_o, ch1[order], -1),
               gain=g1[order].astype(jnp.float32),
               is_dpe=jnp.zeros(ap_capacity, bool),
               valid=valid_o, truth_row=row1[order])
    info = dict(total=total.astype(jnp.int32))
    if n_truth_rows:
        BIG = jnp.int32(2 ** 31 - 1)
        rc = jnp.where(out['valid'], out['truth_row'], 0)
        info['counts'] = jnp.zeros(n_truth_rows, jnp.int32).at[rc].add(
            out['valid'].astype(jnp.int32))
        info['t_min'] = jnp.full(n_truth_rows, BIG, jnp.int32).at[rc].min(
            jnp.where(out['valid'], out['t'], BIG))
        info['t_max'] = jnp.full(n_truth_rows, -BIG, jnp.int32).at[rc].max(
            jnp.where(out['valid'], out['t'], -BIG))
    return out, info


@partial(jax.jit, static_argnames=('n_inst', 'k_candidates'))
def photon_summaries(photons, key, *, n_inst: int, k_candidates: int = 64):
    """Per-instruction photon counts and random time-zero candidates for
    electron-afterpulse generation (the reference samples t-zeros directly
    from the pulse's photon array, afterpulse.py:48-51)."""
    valid = photons['valid']
    row = jnp.where(valid, photons['truth_row'], 0)
    counts = jnp.zeros(n_inst, jnp.int32).at[row].add(valid.astype(jnp.int32))
    offsets = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    # photons are grouped by instruction: slot = offset[i] + floor(u * count)
    u = jax.random.uniform(key, (n_inst, k_candidates))
    slot = offsets[:, None] + (u * jnp.maximum(counts[:, None], 1)).astype(jnp.int32)
    slot = jnp.clip(slot, 0, photons['t'].shape[0] - 1)
    t_zero = photons['t'][slot]
    return counts, t_zero


def reduce_instruction_timing(ap_delay, bin_centers, config):
    """Host-side: coarse-bin photoionization delays so electrons that diffuse
    together share one instruction (reference: afterpulse.py:63-80)."""
    spread = np.sqrt(2 * config['diffusion_constant_longitudinal']
                     * np.asarray(bin_centers))
    spread = spread / config['drift_velocity_liquid']
    coarse, ct = [], 100.0
    while ct < bin_centers[-1]:
        coarse.append(ct)
        ct += spread[np.argmin(np.abs(ct - bin_centers))]
    coarse = np.array(coarse)
    sel = ap_delay < coarse[-1]
    idx = np.digitize(ap_delay[sel], coarse)
    idxs, n = np.unique(idx, return_counts=True)
    return coarse[np.clip(idxs, 0, len(coarse) - 1)], n


def generate_pi_el_instructions(config, resource, rng, counts, t_zero_cand,
                                source_inst, base_time):
    """Host-side photoionization (pi_el, type 4) instruction synthesis
    (reference: afterpulse.py:29-61). One call per source S2 instruction.

    :param counts: per-source-instruction detected photon counts (numpy)
    :param t_zero_cand: (I, K) candidate photon times (window-relative)
    :param source_inst: the numpy instruction array these photons came from
    :param base_time: int64 absolute base of the relative times
    :returns: numpy instruction array (possibly empty)
    """
    hist = resource.uniform_to_ele_ap
    out = []
    for i in range(len(source_inst)):
        n_photons = int(counts[i])
        if n_photons <= 0:
            continue
        n_electron = rng.poisson(hist.n * n_photons
                                 * config['photoionization_modifier'])
        if n_electron <= 0:
            continue
        ap_delay = hist.get_random(n_electron, rng=rng)
        delay_i, n_i = reduce_instruction_timing(ap_delay, hist.bin_centers, config)
        n_instruction = len(delay_i)
        if n_instruction == 0:
            continue
        cand = t_zero_cand[i]
        # cand holds int32 window-relative times; promote before adding the
        # int64 absolute base (spans past ~2.1 s overflow int32)
        t_zeros = base_time + cand[rng.integers(
            0, len(cand), n_instruction)].astype(np.int64)
        new = np.repeat(source_inst[i:i + 1], n_instruction)
        new['type'] = 4
        new['time'] = t_zeros - config['drift_time_gate']
        r = np.sqrt(rng.uniform(0, config['tpc_radius'] ** 2, n_instruction))
        angle = rng.uniform(-np.pi, np.pi, n_instruction)
        new['x'], new['y'] = r * np.cos(angle), r * np.sin(angle)
        new['z'] = -delay_i * config['drift_velocity_liquid']
        new['amp'] = n_i
        out.append(new)
    if not out:
        return np.zeros(0, dtype=source_inst.dtype)
    return np.concatenate(out)


def generate_pe_el_instructions(config, rng, counts, t_zero_cand,
                                source_inst, base_time):
    """Host-side gate photoelectric (pe_el, type 6) instruction synthesis
    (reference: afterpulse.py:92-139)."""
    out = []
    for i in range(len(source_inst)):
        n_photons = int(counts[i])
        if n_photons <= 0:
            continue
        n_electron = rng.poisson(config['photoelectric_p'] * n_photons
                                 * config['photoelectric_modifier'])
        if n_electron <= 0:
            continue
        ap_delay = np.clip(
            rng.normal(config['photoelectric_t_center'] + config['drift_time_gate'],
                       config['photoelectric_t_spread'], n_electron), 0, None)
        cand = t_zero_cand[i]
        t_zeros = base_time + cand[rng.integers(
            0, len(cand), n_electron)].astype(np.int64)
        new = np.repeat(source_inst[i:i + 1], n_electron)
        new['type'] = 6
        new['time'] = t_zeros + config['drift_time_gate']
        r = np.sqrt(rng.uniform(0, config['tpc_radius'] ** 2, n_electron))
        angle = rng.uniform(-np.pi, np.pi, n_electron)
        new['x'], new['y'] = r * np.cos(angle), r * np.sin(angle)
        new['z'] = -ap_delay * config['drift_velocity_liquid']
        new['amp'] = 1
        out.append(new)
    if not out:
        return np.zeros(0, dtype=source_inst.dtype)
    return np.concatenate(out)
