"""Pallas fused ADC+ZLE kernel: bitwise parity vs the sequential oracle
(interpret mode on CPU; the same kernel compiles for TPU via Mosaic)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wfsim_tpu.ops.pallas_zle import fused_adc_zle, BIG
from .reference_semantics import intervals_below_threshold


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_fused_adc_zle_parity(seed):
    rng = np.random.default_rng(seed)
    R, T = 20, 1024
    c2adc, baseline, thr_v = 5.83e-4, 16000, 15984
    W = np.zeros((R, T), np.float32)
    for r in range(R):
        for _ in range(rng.integers(0, 5)):
            lo = int(rng.integers(64, T - 256))
            W[r, lo:lo + int(rng.integers(3, 60))] = rng.uniform(1e5, 8e7)
    ch_left = rng.integers(0, 40, R).astype(np.int32)
    ch_right = (T - 1 - rng.integers(0, 40, R)).astype(np.int32)
    mask = rng.random(R) < 0.9
    thr = np.full(R, thr_v, np.int32)

    data, starts, ends = fused_adc_zle(
        jnp.asarray(W), jnp.asarray(ch_left), jnp.asarray(ch_right),
        jnp.asarray(mask), jnp.asarray(thr), c2adc, baseline,
        holdoff=101, trigger_window=50, block_rows=8, interpret=True)
    data = np.asarray(data)
    starts = np.asarray(starts)
    ends = np.asarray(ends)

    for r in range(R):
        if not mask[r]:
            assert all(s >= BIG for s in starts[r])
            continue
        seg = data[r, ch_left[r]:ch_right[r] + 1].astype(np.int64)
        itvs = intervals_below_threshold(seg, thr_v, 101)
        exp = []
        for (lo, hi) in itvs:
            lo2 = max(lo - 50, 0)
            hi2 = min(hi + 50, len(seg) - 1)
            exp.append((int(np.ceil(lo2 / 2) * 2), int(np.floor(hi2 / 2) * 2)))
        got = list(zip([int(s) for s in starts[r] if s < BIG],
                       [int(e) for e in ends[r] if e > -BIG]))
        assert got == exp, (r, got, exp)
        # the ADC data itself must match the elementwise definition
        win = slice(ch_left[r], ch_right[r] + 1)
        expect_d = np.maximum(
            -np.around(W[r][win].astype(np.float64) * c2adc) + baseline, 0)
        np.testing.assert_array_equal(data[r][win], expect_d.astype(np.int16))
