"""Pallas fused ADC + ZLE kernel.

The XLA version of the post-waveform chain (ADC conversion, baseline,
saturation, threshold scan, gap bridging, interval extraction) materializes
~10 row-grid intermediates in HBM.  This kernel keeps one row-block resident
in VMEM and does the whole chain in a single pass over the waveform grid:

    W (f32 current) -> data (int16 ADC) + interval starts/ends per row

Interval markers are emitted block-compressed: consecutive starts (ends) are
at least holdoff+1 samples apart, so each 64-sample block holds at most one;
the output is one candidate slot per block, ascending, with BIG marking
empty slots — exactly the representation the record packer consumes.

Used by the digitize pipeline when ``use_pallas_zle`` is enabled; the XLA
path (ops/zle.py) remains the reference implementation and the default:
on the current tunnel-attached v5e the fused kernel measured slower end to
end (the full-width marker outputs double the grid writes, and long windows
force small row blocks) — it is kept as a validated building block for a
future revision that emits compressed markers directly.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['fused_adc_zle', 'BIG']

BIG = np.int32(2 ** 30)
_SUB = 64           # candidate block size; requires holdoff + 1 >= _SUB


def _kernel(w_ref, lim_ref, thr_ref, scal_ref,
            data_ref, starts_ref, ends_ref):
    c2adc = scal_ref[0]
    baseline = scal_ref[1].astype(jnp.int32)
    holdoff = scal_ref[2].astype(jnp.int32)
    trigger = scal_ref[3].astype(jnp.int32)

    W = w_ref[:, :]
    RB, T = W.shape
    l = lim_ref[:, 0][:, None]
    r = lim_ref[:, 1][:, None]
    msk = lim_ref[:, 2][:, None] > 0
    thr = thr_ref[:, 0][:, None]

    idx = jax.lax.broadcasted_iota(jnp.int32, (RB, T), 1)
    in_win = (idx >= l) & (idx <= r) & msk

    adc = (-jnp.round(W * c2adc)).astype(jnp.int32)
    d = jnp.where(in_win, jnp.maximum(adc + baseline, 0), 0)
    data_ref[:, :] = d.astype(jnp.int16)

    below = (d < thr) & in_win
    # log-step prefix sum (Mosaic has no cumsum primitive)
    csum = below.astype(jnp.int32)
    sh = 1
    while sh < T:
        rolled = pltpu.roll(csum, sh, axis=1)
        csum = csum + jnp.where(idx >= sh, rolled, 0)
        sh *= 2

    # windowed-any via shifted cumulative sums (all static shapes)
    def shifted(x, k):
        # y[i] = x[i - k] for i >= k else 0  (k > 0)
        pad = jnp.zeros((RB, T), jnp.int32)
        return jnp.where(idx >= k, pltpu.roll(x, k, axis=1), pad)

    h = holdoff
    # prev_cnt[i] = csum[i-1] - csum[i-h-1]
    prev_cnt = shifted(csum, 1) - shifted(csum, 1 + h)
    # next_cnt[i] = csum[min(i+h, T-1)] - csum[i]
    fwd = pltpu.roll(csum, T - h, axis=1)   # roll left by h
    last = csum[:, T - 1][:, None]
    fwd = jnp.where(idx < T - h, fwd, last)
    next_cnt = fwd - csum

    start_m = below & (prev_cnt == 0)
    end_m = below & (next_cnt == 0)

    # block-compress via in-lane sliding minimum folds (Mosaic cannot split
    # the lane dimension with a reshape); the wrapper strides out one
    # candidate per 64-sample block afterwards
    def compress_full(m):
        x = jnp.where(m, idx, BIG)
        sh = 1
        while sh < _SUB:
            rolled = pltpu.roll(x, T - sh, axis=1)  # left by sh
            rolled = jnp.where(idx + sh < T, rolled, BIG)
            x = jnp.minimum(x, rolled)
            sh *= 2
        return x

    starts_ref[:, :] = compress_full(start_m)
    ends_ref[:, :] = compress_full(end_m)


@partial(jax.jit, static_argnames=('c2adc', 'baseline', 'holdoff',
                                   'trigger_window', 'block_rows',
                                   'interpret'))
def fused_adc_zle(W, ch_left, ch_right, mask, thresholds,
                  c2adc: float, baseline: int,
                  *, holdoff: int, trigger_window: int,
                  block_rows: int = 256, interpret: bool = False):
    """Fused ADC + ZLE over a (R, T) current grid.

    :returns: (data int16 (R, T), starts (R, T//64) int32 rel-to-ch_left
        with BIG for empty slots, ends (R, T//64) with -BIG for empty).
    """
    R, T = W.shape
    assert T % _SUB == 0
    assert holdoff + 1 >= _SUB, 'block compression needs holdoff+1 >= 64'
    nb = T // _SUB
    # VMEM budget: ~56 bytes/row-sample live in the kernel (f32 in, int16 +
    # 2x int32 out, and Mosaic temporaries across the roll chains)
    rows_fit = max(8, int(9e6 / (56 * T)) // 8 * 8)
    RB = min(block_rows, rows_fit, R)
    n_blocks = -(-R // RB)
    R_pad = n_blocks * RB

    def pad_rows(x, fill=0):
        if x.shape[0] == R_pad:
            return x
        return jnp.concatenate(
            [x, jnp.full((R_pad - R,) + x.shape[1:], fill, x.dtype)])

    Wp = pad_rows(W.astype(jnp.float32))
    lim = jnp.stack([ch_left.astype(jnp.int32),
                     ch_right.astype(jnp.int32),
                     mask.astype(jnp.int32)], axis=1)
    lim = pad_rows(lim)
    thr = pad_rows(thresholds.astype(jnp.int32)[:, None])
    scal = jnp.asarray([c2adc, float(baseline), float(holdoff),
                        float(trigger_window)], jnp.float32)

    data, starts_f, ends_f = pl.pallas_call(
        _kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((RB, T), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((RB, T), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, T), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, T), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R_pad, T), jnp.int16),
            jax.ShapeDtypeStruct((R_pad, T), jnp.int32),
            jax.ShapeDtypeStruct((R_pad, T), jnp.int32),
        ],
        interpret=interpret,
    )(Wp, lim, thr, scal)
    data = data[:R]
    s_cand = starts_f[:R, ::_SUB]
    e_cand = ends_f[:R, ::_SUB]

    # trigger-window pad, clip to the channel window, even alignment
    # (reference: rawdata.py:303-308), relative to the channel left edge
    l = ch_left.astype(jnp.int32)[:, None]
    r = ch_right.astype(jnp.int32)[:, None]
    length = r - l + 1
    s_rel = jnp.clip(s_cand - l - trigger_window, 0, length - 1)
    e_rel = jnp.clip(e_cand - l + trigger_window, 0, length - 1)
    s_rel = ((s_rel + 1) // 2) * 2
    e_rel = (e_rel // 2) * 2
    starts = jnp.where(s_cand < BIG, s_rel, BIG)
    ends = jnp.where(e_cand < BIG, e_rel, -BIG)
    return data, starts, ends
