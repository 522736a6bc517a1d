"""Photons -> per-channel waveform grid.

This replaces the reference's innermost hot loop ``Pulse.add_current``
(reference: wfsim/core/pulse.py:276-318), which scatter-adds a 22-sample SPE
current template (one of 10 one-nanosecond sub-sample phases) per photon into
a per-channel waveform, one channel at a time in numba.

TPU-native formulation (two phases, both dense):

1. **Phase histogram** — scatter-add each photon's gain into a
   (channels, samples, 10) histogram ``H`` indexed by (channel,
   sample = t//dt - left, remainder = t%dt).  One scalar update per photon;
   duplicates coalesce in the scatter (the reference coalesced same-ns photons
   by sorting, pulse.py:297-313).
2. **Template convolution** — the waveform is then exactly a 1-D convolution
   along the sample axis with the (10 -> 1)-feature template bank:
   ``W[c, u] = sum_{r,k} H[c, u-k, r] * T[r, k]``.  This runs as a dense XLA
   TPU convolution (MXU/VPU), fused with the downstream elementwise work.

All shapes are static; validity is carried as a mask.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['make_templates', 'photons_to_waveform', 'template_extent']


def make_templates(pe_pulse_ts, pe_pulse_ys,
                   sample_duration: int = 10,
                   samples_before: int = 2,
                   samples_after: int = 20) -> np.ndarray:
    """Build the (sample_duration, template_length) SPE current template bank.

    Same construction as the reference (wfsim/core/pulse.py:146-187):
    interpolate the SPE pulse CDF so every template integrates to exactly one
    PE per sample_duration, one template per 1-ns sub-sample remainder.
    Template row r applies to photons with ``t % dt == r``.
    """
    ts = np.asarray(pe_pulse_ts, dtype=np.float64)
    cdf_y = np.cumsum(np.asarray(pe_pulse_ys, dtype=np.float64))

    def pe_pulse_cdf(x):
        return np.interp(x, ts, cdf_y, left=0.0, right=1.0)

    samples = np.linspace(-samples_before * sample_duration,
                          samples_after * sample_duration,
                          1 + samples_before + samples_after)
    templates = []
    for r in range(sample_duration):
        current = np.diff(pe_pulse_cdf(samples - r)) / sample_duration
        current *= (1 / sample_duration) / np.sum(current)
        templates.append(current)
    return np.asarray(templates, dtype=np.float32)


def template_extent(config) -> tuple:
    """(samples_before_pulse_center, samples_after_pulse_center)."""
    return (int(config.get('samples_before_pulse_center', 2)),
            int(config.get('samples_after_pulse_center', 20)))


@partial(jax.jit, static_argnames=('n_channels', 'n_samples', 'sample_duration'))
def photons_to_waveform(times, channels, gains, valid,
                        left_sample,
                        templates,
                        *,
                        n_channels: int,
                        n_samples: int,
                        sample_duration: int = 10):
    """Accumulate photon hits into a dense (n_channels, n_samples) waveform.

    Device-side times are int32 nanosecond offsets from a host-tracked int64
    base time (windows are bounded well below 2^31 ns); this keeps the whole
    compute path in native 32-bit TPU arithmetic.

    :param times:    (N,) int32 photon arrival times [ns, window-relative]
    :param channels: (N,) int32 PMT channel per photon
    :param gains:    (N,) float32 per-photon gain (electrons / PE)
    :param valid:    (N,) bool validity mask (padding slots are False)
    :param left_sample: scalar int — sample index (in the same relative frame)
        of waveform column 0
    :param templates: (sample_duration, L) float32 SPE template bank
    :returns: (n_channels, n_samples) float32 current waveform, in the same
        current units as the reference (pe / sample_duration scaled by gain).

    Placement matches the reference exactly: a photon at time t adds
    ``gain * templates[t % dt]`` starting at sample ``t // dt``
    (reference: wfsim/core/pulse.py:303-318).
    """
    dt = sample_duration
    L = templates.shape[1]
    t32 = times.astype(jnp.int32)
    s = (t32 // dt - left_sample).astype(jnp.int32)
    r = (t32 % dt).astype(jnp.int32)

    ok = valid & (s >= 0) & (s < n_samples) & (channels >= 0) & (channels < n_channels)
    g = jnp.where(ok, gains, 0.0).astype(jnp.float32)
    # Route masked photons to slot 0 with zero gain
    s = jnp.where(ok, s, 0)
    r = jnp.where(ok, r, 0)
    ch = jnp.where(ok, channels, 0).astype(jnp.int32)

    # Histogram layout (C, dt, T): the sample axis stays minormost so the
    # array is lane-aligned — a (..., dt=10)-minormost layout would be padded
    # 10 -> 128 lanes by the TPU (12.8x the HBM footprint).
    # (A 2-D (C*dt, T+L-1) pre-padded variant consumed segment-wise by the
    # MXU matmul won its isolated A/B, bench_micro6.py v2, but REGRESSED
    # in the full gather_digitize context: the per-segment slice/reshape
    # copies outweighed the single retile once the downstream ADC/ZLE
    # consumers were fused in — 46.5 -> 58.1 ms/call traced.  Kept on the
    # flat-scatter + retile form.)
    flat_idx = (ch.astype(jnp.int32) * dt + r) * n_samples + s
    H = jnp.zeros((n_channels * dt * n_samples,), dtype=jnp.float32)
    H = H.at[flat_idx].add(g)
    H = H.reshape(n_channels, dt, n_samples)

    # W[c, u] = sum_{r,k} H[c, r, u - k] * T[r, k] — causal conv along the
    # sample axis with the dt phases as input features.
    if n_samples % 128 == 0:
        # Banded-matmul form: XLA lowers the (O=1, I=10, W=22) conv to a
        # VPU loop fusion (~220 MACs/sample, measured 26 ms per digitize
        # call); expressing each 128-sample output block as
        # (rows, 10*149) x (10*149, 128) runs on the MXU instead.
        return _conv_templates_mxu(H, templates.astype(jnp.float32))
    kernel = jnp.flip(templates, axis=1).astype(jnp.float32)  # (dt, L)
    kernel = kernel[None, :, :]                               # (O=1, I=dt, L)
    W = jax.lax.conv_general_dilated(
        H, kernel,
        window_strides=(1,),
        padding=((L - 1, 0),),
        dimension_numbers=('NCW', 'OIW', 'NCW'),
        preferred_element_type=jnp.float32,
        # full f32: default TPU conv/dot precision truncates operands to
        # bf16, which costs ~0.4% per-sample error — visible after ADC
        # rounding
        precision=jax.lax.Precision.HIGHEST,
    )
    return W[:, 0, :]


def _conv_templates_mxu(H, templates, prepadded=False):
    """Causal phase-bank convolution as a banded matmul.

    ``W[c, u] = sum_{r,k} H[c, r, u-k] * T[r, k]`` over 128-sample output
    blocks: each block's (10, 128+L-1) input patch (L-1 samples of history)
    contracts its flattened (10*(128+L-1),) axis against a banded template
    matrix ``B[(r, m), u] = T[r, u-m+L-1]`` — (rows, 1490) x (1490, 128)
    MXU matmuls in full f32.

    The blocks run as an unrolled loop of ``dynamic_slice`` + ``dot_general``
    (one matmul per 128-sample block) rather than one
    (rows*blocks, 1490)-row matmul over a gathered patch tensor: the
    one-big-matmul form makes XLA materialize the (R, nseg, 10, M) patch
    array through two full-size layout copies plus a reshape pass
    (~37 ms of pure data movement per digitize call at bench shapes, 3x
    the matmul itself), while the slice form reads ``Hp`` in place.
    Measured A/B at the (31616, 10, 1024) trace shape: 56.3 -> 13.3
    ms/call, compile 302 s -> 10 s; results agree to 1 f32 ulp (630 of
    32.4M elements differ, reduction-order only).
    """
    L = templates.shape[1]
    if prepadded:
        Hp = H
        R, dt, T = H.shape[0], H.shape[1], H.shape[2] - (L - 1)
    else:
        R, dt, T = H.shape
        Hp = jnp.pad(H, ((0, 0), (0, 0), (L - 1, 0)))
    S = 128
    nseg = T // S
    M = S + L - 1
    u = jnp.arange(S, dtype=jnp.int32)[None, :]
    m = jnp.arange(M, dtype=jnp.int32)[:, None]
    k = u - m + (L - 1)                                     # (M, S)
    band = jnp.where((k >= 0) & (k < L),
                     templates[:, jnp.clip(k, 0, L - 1)],   # (dt, M, S)
                     0.0).reshape(dt * M, S)
    outs = []
    for j in range(nseg):
        Pj = jax.lax.dynamic_slice(Hp, (0, 0, j * S), (R, dt, M))
        outs.append(jax.lax.dot_general(
            Pj.reshape(R, dt * M), band,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST))
    return jnp.concatenate(outs, axis=1)
