"""Parity tests for the native host kernels (wfsim_tpu._fastpath).

Every native entry point must match its numpy fallback bitwise; these tests
run both paths on the same inputs.  Skipped when the extension isn't built
(``python setup.py build_ext --inplace``).
"""
import numpy as np
import pytest

from wfsim_tpu import native
from wfsim_tpu.pipeline.digitize import (
    decode_records, add_noise_host, noise_bank_ext_cm, compact_mask4,
    expand_mask4, SAMPLES_PER_RECORD)

pytestmark = pytest.mark.skipif(
    not native.HAVE_NATIVE, reason='native extension not built')


def _encode(records, lengths, baseline, rng):
    """Host-side reference encoder mirroring pack_records_encoded's format:
    difference masks (big-endian bits), DPCM int8 stream with -128 escapes,
    int16 escape values."""
    spr = SAMPLES_PER_RECORD
    R = len(records)
    pred = np.where(np.arange(spr)[None, :] < lengths[:, None],
                    np.int16(baseline), np.int16(0))
    dm = records != pred
    dm_p = np.pad(dm, ((0, 0), (0, 112 - spr)))
    masks = np.packbits(dm_p, axis=1)
    d8, escs = [], []
    for r in range(R):
        prev = baseline
        for k in np.flatnonzero(dm[r]):
            v = int(records[r, k])
            d = v - prev
            if abs(d) > 127:
                d8.append(-128)
                escs.append(v)
            else:
                d8.append(d)
            prev = v
    return (masks, np.asarray(d8, np.int8), np.asarray(escs, np.int16))


def _random_records(rng, R, baseline, wild=False):
    lengths = rng.integers(1, SAMPLES_PER_RECORD + 1, R).astype(np.int64)
    recs = np.where(
        np.arange(SAMPLES_PER_RECORD)[None, :] < lengths[:, None],
        np.int16(baseline), np.int16(0))
    # sprinkle smooth pulses + (optionally) wild escape-triggering jumps
    for r in range(R):
        n = int(lengths[r])
        lo = rng.integers(0, max(n - 5, 1))
        hi = min(lo + rng.integers(2, 40), n)
        vals = baseline - np.cumsum(rng.integers(-20, 60, hi - lo))
        if wild and rng.random() < 0.5:
            vals[rng.integers(0, len(vals))] += int(rng.integers(300, 5000))
        recs[r, lo:hi] = np.clip(vals, -32768, 32767).astype(np.int16)
    return recs, lengths


@pytest.mark.parametrize('wild', [False, True])
def test_decode_matches_numpy(wild):
    rng = np.random.default_rng(11 + wild)
    baseline = 16000
    R = 257
    recs, lengths = _random_records(rng, R, baseline, wild=wild)
    masks, d8, escs = _encode(recs, lengths, baseline, rng)

    ref = decode_records(lengths, masks, d8, escs, baseline)
    np.testing.assert_array_equal(ref, recs)   # encoder sanity

    m4, me = compact_mask4(masks)
    out = native.decode_residual_records(lengths, m4, me, d8, escs, baseline)
    np.testing.assert_array_equal(out, ref)


def test_decode_with_noise_matches_numpy():
    rng = np.random.default_rng(5)
    baseline = 16000
    R = 301
    Cn, L = 24, 997
    recs, lengths = _random_records(rng, R, baseline)
    masks, d8, escs = _encode(recs, lengths, baseline, rng)
    bank = rng.integers(-40, 40, (L, Cn)).astype(np.int32)
    ext = noise_bank_ext_cm(bank)
    channel = rng.integers(0, Cn + 8, R).astype(np.int64)  # some beyond bank
    start_s = rng.integers(0, 3000, R).astype(np.int64)
    left_ch = rng.integers(0, 3000, R).astype(np.int64)
    nix = rng.integers(0, L, R).astype(np.int64)

    ref = decode_records(lengths, masks, d8, escs, baseline)
    add_noise_host(ref, channel, start_s, lengths, left_ch, nix, bank,
                   ext_cm=ext)
    m4, me = compact_mask4(masks)
    out = native.decode_residual_records(
        lengths, m4, me, d8, escs, baseline, channel=channel,
        start_s=start_s, left_ch=left_ch, nix_rec=nix, bank=bank, ext_cm=ext)
    np.testing.assert_array_equal(out, ref)


def test_decode_scatter_into_records_matches_dense():
    """Scatter mode (out_records + rowmap) must write exactly the dense
    decode's rows into the mapped slots of the structured array, through
    both the native and the numpy fallback paths, with noise re-add."""
    from wfsim_tpu.dtypes import raw_record_dtype
    rng = np.random.default_rng(17)
    baseline = 16000
    R = 211
    Cn, L = 16, 503
    recs, lengths = _random_records(rng, R, baseline, wild=True)
    masks, d8, escs = _encode(recs, lengths, baseline, rng)
    bank = rng.integers(-40, 40, (L, Cn)).astype(np.int32)
    ext = noise_bank_ext_cm(bank)
    channel = rng.integers(0, Cn + 4, R).astype(np.int64)
    start_s = rng.integers(0, 3000, R).astype(np.int64)
    left_ch = rng.integers(0, 3000, R).astype(np.int64)
    nix = rng.integers(0, L, R).astype(np.int64)

    m4, me = compact_mask4(masks)
    dense = native.decode_residual_records(
        lengths, m4, me, d8, escs, baseline, channel=channel,
        start_s=start_s, left_ch=left_ch, nix_rec=nix, bank=bank, ext_cm=ext)

    rowmap = rng.permutation(R).astype(np.int64)
    out = np.zeros(R, raw_record_dtype(SAMPLES_PER_RECORD))
    ret = native.decode_residual_records(
        lengths, m4, me, d8, escs, baseline, channel=channel,
        start_s=start_s, left_ch=left_ch, nix_rec=nix, bank=bank, ext_cm=ext,
        out_records=out, rowmap=rowmap)
    assert ret is None
    np.testing.assert_array_equal(out['data'][rowmap], dense)

    # numpy fallback path (bitwise-identical by contract)
    out2 = np.zeros(R, raw_record_dtype(SAMPLES_PER_RECORD))
    orig = native.HAVE_NATIVE
    try:
        native.HAVE_NATIVE = False
        native.decode_residual_records(
            lengths, m4, me, d8, escs, baseline, channel=channel,
            start_s=start_s, left_ch=left_ch, nix_rec=nix, bank=bank,
            ext_cm=ext, out_records=out2, rowmap=rowmap)
    finally:
        native.HAVE_NATIVE = orig
    np.testing.assert_array_equal(out2['data'], out['data'])

    # out-of-range rowmap must raise, not scribble
    bad = rowmap.copy()
    bad[3] = R + 7
    with pytest.raises(ValueError):
        native.decode_residual_records(
            lengths, m4, me, d8, escs, baseline, out_records=out, rowmap=bad)


def test_decode_header_fill_matches_numpy():
    """Header-fill mode must write the same time/length/dt/channel/
    pulse_length/record_i values the old strided numpy assignments
    produced, through both the native and fallback paths."""
    from wfsim_tpu.dtypes import raw_record_dtype
    rng = np.random.default_rng(29)
    baseline = 16000
    R = 223
    recs, lengths = _random_records(rng, R, baseline, wild=True)
    masks, d8, escs = _encode(recs, lengths, baseline, rng)
    m4, me = compact_mask4(masks)
    channel = rng.integers(0, 494, R).astype(np.int64)
    time_ns = rng.integers(0, 2 ** 50, R).astype(np.int64)
    plen = rng.integers(1, 5000, R).astype(np.int64)
    reci = rng.integers(0, 40, R).astype(np.int64)
    rowmap = rng.permutation(R).astype(np.int64)
    dt = 10

    def _run():
        out = np.zeros(R, raw_record_dtype(SAMPLES_PER_RECORD))
        native.decode_residual_records(
            lengths, m4, me, d8, escs, baseline, channel=channel,
            out_records=out, rowmap=rowmap, time_ns=time_ns,
            pulse_length=plen, record_i=reci, rec_dt=dt)
        return out

    out_c = _run()
    # expected: the old caller-side strided assignments
    exp = np.zeros(R, raw_record_dtype(SAMPLES_PER_RECORD))
    exp['data'][rowmap] = decode_records(lengths, masks, d8, escs, baseline)
    order = np.empty(R, np.int64)
    order[rowmap] = np.arange(R)   # stream index occupying each slot
    exp['time'] = time_ns[order]
    exp['length'] = lengths[order]
    exp['dt'] = dt
    exp['channel'] = channel[order].astype(np.int16)
    exp['pulse_length'] = plen[order]
    exp['record_i'] = reci[order].astype(np.int16)
    np.testing.assert_array_equal(out_c, exp)

    orig = native.HAVE_NATIVE
    try:
        native.HAVE_NATIVE = False
        out_n = _run()
    finally:
        native.HAVE_NATIVE = orig
    np.testing.assert_array_equal(out_n, out_c)


def test_decode_empty():
    out = native.decode_residual_records(
        np.zeros(0, np.int64), np.zeros((0, 4), np.uint8),
        np.zeros((0, 14), np.uint8),
        np.zeros(0, np.int8), np.zeros(0, np.int16), 16000)
    assert out.shape == (0, SAMPLES_PER_RECORD)


def test_compact_mask4_roundtrip():
    """compact_mask4/expand_mask4 must be exact inverses on arbitrary
    masks, and the compact form must agree with the device pack kernel's
    rec_mask4/rec_mask_esc outputs (same selection rule)."""
    rng = np.random.default_rng(23)
    R = 400
    bits = rng.random((R, SAMPLES_PER_RECORD)) < 0.3
    # mix in pure-run rows (the common case)
    for r in range(0, R, 3):
        bits[r] = False
        lo = rng.integers(0, 100)
        bits[r, lo:lo + rng.integers(1, 10)] = True
    masks = np.packbits(np.pad(bits, ((0, 0), (0, 112 - SAMPLES_PER_RECORD))),
                        axis=1)
    m4, me = compact_mask4(masks)
    back = expand_mask4(m4, me)
    np.testing.assert_array_equal(back, masks)
    assert (m4[:, 0] == 255).sum() == len(me)


def test_pack_windows_matches_numpy():
    rng = np.random.default_rng(3)
    P, M, B, N = 5000, 40, 8, 1024
    pool_t = rng.integers(0, 10 ** 9, P).astype(np.int64)
    pool_ch = rng.integers(0, 494, P).astype(np.int32)
    pool_g = rng.uniform(1e5, 1e7, P).astype(np.float32)
    piece_win = np.sort(rng.integers(0, B, M)).astype(np.int32)
    piece_lo = rng.integers(0, P - 200, M).astype(np.int64)
    piece_cnt = rng.integers(0, 200, M).astype(np.int64)
    base = rng.integers(0, 10 ** 8, B).astype(np.int64)

    out_n = np.empty((B, 3, N), np.int32)
    out_n[:, 1, :] = -1
    out_c = out_n.copy()

    import wfsim_tpu.native as nat
    fill_c = nat.pack_windows(pool_t, pool_ch, pool_g, piece_lo, piece_cnt,
                              piece_win, base, out_c)
    # numpy fallback path
    have = nat.HAVE_NATIVE
    nat.HAVE_NATIVE = False
    try:
        fill_n = nat.pack_windows(pool_t, pool_ch, pool_g, piece_lo,
                                  piece_cnt, piece_win, base, out_n)
    finally:
        nat.HAVE_NATIVE = have
    assert list(fill_c) == list(fill_n)
    np.testing.assert_array_equal(out_c, out_n)
