"""Window digitization: photons -> digitized multi-channel grid -> ZLE.

One fused jitted pass per digitization window, replacing the reference's
``digitize_pulse_cache`` + ``ZLE`` (reference: wfsim/core/rawdata.py:204-311):

1. superpose SPE templates into the TPC waveform (ops/waveform.py),
2. ADC conversion with banker's rounding and sign flip,
3. high-energy channel copies and bottom sum-signal channel,
4. real-noise overlay (wrap-around indexed noise bank),
5. baseline addition and digitizer saturation (clip at zero),
6. zero-length encoding (ops/zle.py).

Everything is masked per channel to its active window, matching the
reference's channel-mask bookkeeping exactly.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.waveform import photons_to_waveform
from ..ops.zle import zle_all_channels

__all__ = ['digitize_window']


def _channel_extents(t, ch, valid, n_channels, dt, before, after, store_b, store_a):
    """Per-channel pulse extents in samples (reference: pulse.py:117-127 for
    the margins, rawdata.py:231-235 for the min/max bookkeeping)."""
    BIG = jnp.int32(2 ** 30)
    s = t // dt
    chc = jnp.where(valid, jnp.clip(ch, 0, n_channels - 1), 0)
    smin = jnp.full(n_channels, BIG, jnp.int32).at[chc].min(
        jnp.where(valid, s, BIG))
    smax = jnp.full(n_channels, -BIG, jnp.int32).at[chc].max(
        jnp.where(valid, s, -BIG))
    has = smax >= smin - 0  # any photon
    pl = smin - store_b - before
    pr = smax + store_a + after
    return pl, pr, has


@partial(jax.jit, static_argnames=('const', 'n_samples', 'max_intervals'))
def digitize_window(params, const, t, ch, gain, valid, key, noise_ix,
                    *, n_samples: int, max_intervals: int = 128):
    """Digitize one window.

    :param t: (N,) int32 photon times, ns relative to the window's left edge
        (sample 0 starts at t=0)
    :param ch/gain/valid: photon arrays
    :param noise_ix: int32 random noise-bank start offset (host-drawn)
    :returns: dict with data (C_all, T) int16, ch_mask/ch_left/ch_right
        (C_all,), zle starts/ends/counts
    """
    dt = const.sample_duration
    C = const.n_tpc_pmts
    C_all = const.n_channels_total
    T = n_samples

    # 1-2. waveform + ADC (reference: rawdata.py:236 '-np.around(...)')
    W = photons_to_waveform(t, ch, gain, valid, 0, params.templates,
                            n_channels=C, n_samples=T, sample_duration=dt)
    adc = (-jnp.round(W * const.current_2_adc)).astype(jnp.int32)

    # channel windows +- trigger window (reference: rawdata.py:258-259)
    pl, pr, has = _channel_extents(
        t, ch, valid, C, dt,
        const.samples_before_pulse_center, const.samples_after_pulse_center,
        const.samples_to_store_before, const.samples_to_store_after)
    ch_left = jnp.clip(pl - const.trigger_window, 0, T - 1)
    ch_right = jnp.clip(pr + const.trigger_window, 0, T - 1)

    # 3. assemble the full digitizer grid
    data = jnp.zeros((C_all, T), jnp.int32)
    data = data.at[:C].set(adc)
    mask = jnp.zeros(C_all, bool).at[:C].set(has)
    left_all = jnp.full(C_all, 0, jnp.int32).at[:C].set(ch_left)
    right_all = jnp.full(C_all, 0, jnp.int32).at[:C].set(ch_right)

    if const.detector == 'XENONnT' and const.he_channel_end >= const.he_channel_start:
        # HE copies of top-array channels, deamplified with the reference's
        # integer cast (rawdata.py:242: adc * int(factor) — 0 for factor<1)
        n_top = const.n_top_pmts
        he_lo = const.he_channel_start
        adc_he = adc[:n_top] * const.high_energy_deamp_int
        data = data.at[he_lo:he_lo + n_top].set(adc_he)
        mask = mask.at[he_lo:he_lo + n_top].set(has[:n_top])
        left_all = left_all.at[he_lo:he_lo + n_top].set(ch_left[:n_top])
        right_all = right_all.at[he_lo:he_lo + n_top].set(ch_right[:n_top])
        # bottom-array sum signal on the sum channel; note the reference does
        # NOT set the channel mask there (rawdata.py:250-254), so it is
        # excluded from noise/baseline/ZLE — replicated for parity.
        bot_sum = jnp.sum(
            adc[n_top:C] * const.high_energy_deamp_int, axis=0)
        data = data.at[const.sum_signal_channel].add(bot_sum)

    idx = jnp.arange(T, dtype=jnp.int32)
    in_win = (idx[None, :] >= left_all[:, None]) & \
             (idx[None, :] <= right_all[:, None]) & mask[:, None]

    # 4. noise overlay (reference: rawdata.py:398-437): per channel, the noise
    # trace starts at the same random bank offset, aligned to the channel's
    # own window start, wrapping around the bank.
    if const.enable_noise and params.noise_data is not None:
        L = params.noise_data.shape[0]
        Cn = params.noise_data.shape[1]
        nch = min(Cn, C_all)
        col = (noise_ix + idx[None, :] - left_all[:nch, None]) % L
        noise = jnp.take_along_axis(
            params.noise_data[:, :nch].T, col, axis=1)
        data = data.at[:nch].add(jnp.where(in_win[:nch], noise, 0))

    # 5. baseline + saturation (reference: rawdata.py:439-458)
    data = data + jnp.where(in_win, const.digitizer_reference_baseline, 0)
    data = jnp.where(in_win, jnp.maximum(data, 0), data)

    # 6. ZLE (reference: rawdata.py:274-311)
    holdoff = 2 * const.trigger_window + 1
    starts, ends, counts = zle_all_channels(
        data, params.zle_thresholds, left_all, right_all, mask,
        holdoff=holdoff, trigger_window=const.trigger_window,
        max_intervals=max_intervals)

    return dict(data=data.astype(jnp.int16),
                ch_mask=mask, ch_left=left_all, ch_right=right_all,
                zle_starts=starts, zle_ends=ends, zle_counts=counts)
