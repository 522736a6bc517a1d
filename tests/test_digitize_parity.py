"""Bitwise parity of the DAQ chain (no randomness): fixed photon inputs
through our fused digitize kernel must reproduce a plain-numpy rendition of
the reference semantics exactly — superposition, ADC rounding, baseline,
saturation, ZLE with holdoff/trigger-window/even-alignment, record packing."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wfsim_tpu.config import default_config
from wfsim_tpu.resources.loader import load_config
from wfsim_tpu.models.params import build_params, build_constants
from wfsim_tpu.ops.waveform import make_templates
from wfsim_tpu.pipeline.digitize import (gather_digitize, pack_records,
                                         SAMPLES_PER_RECORD)

from .reference_semantics import intervals_below_threshold, scatter_spe


def numpy_digitize(c, templates, t, ch, gain, T, n_channels, noise=None):
    """Reference-semantics oracle: wfsim/core/rawdata.py:204-311 (with the
    optional noise overlay of rawdata.py:398-437: bank rows aligned to each
    channel's window start, wrap-around)."""
    W = scatter_spe(t, ch, gain, 0, n_channels, T, templates)
    adc = -np.around(W * c['current_2_adc']).astype(np.int64)
    # channel windows
    out = {}
    for cch in np.unique(ch):
        s = (t[ch == cch] // 10).astype(int)
        pl = s.min() - c['samples_to_store_before'] - 2
        pr = s.max() + c['samples_to_store_after'] + 20
        cl = max(pl - c['trigger_window'], 0)
        cr = min(pr + c['trigger_window'], T - 1)
        data = adc[cch].copy()
        if noise is not None:
            bank, nix = noise
            L = bank.shape[0]
            if cch < bank.shape[1]:
                data[cl:cr + 1] += bank[(nix + np.arange(cr + 1 - cl)) % L,
                                        cch]
        data[cl:cr + 1] += c['digitizer_reference_baseline']
        np.clip(data[cl:cr + 1], 0, None, out=data[cl:cr + 1])
        seg = data[cl:cr + 1]
        thr = c['digitizer_reference_baseline'] - c['zle_threshold'] - 1
        itvs = intervals_below_threshold(seg, thr, 2 * c['trigger_window'] + 1)
        recs = []
        for (lo, hi) in itvs:
            lo2 = max(lo - c['trigger_window'], 0)
            hi2 = min(hi + c['trigger_window'], len(seg) - 1)
            lo2 = int(np.ceil(lo2 / 2.0) * 2)
            hi2 = int(np.floor(hi2 / 2.0) * 2)
            pulse = seg[lo2:hi2 + 1]
            plen = len(pulse)
            nrec = -(-plen // SAMPLES_PER_RECORD)
            padded = np.pad(pulse, (0, nrec * SAMPLES_PER_RECORD - plen))
            for i in range(nrec):
                recs.append((cl + lo2 + i * SAMPLES_PER_RECORD,
                             min(plen - i * SAMPLES_PER_RECORD,
                                 SAMPLES_PER_RECORD),
                             plen, i,
                             padded[i * SAMPLES_PER_RECORD:
                                    (i + 1) * SAMPLES_PER_RECORD]))
        out[int(cch)] = recs
    return out


@pytest.mark.parametrize('seed', [0, 1])
def test_digitize_bitwise_parity(seed):
    c = default_config()
    res = load_config(c)
    params = build_params(c, res)
    const = build_constants(c)
    templates = make_templates(c['pe_pulse_ts'], c['pe_pulse_ys'])

    rng = np.random.default_rng(seed)
    T = 1024
    n = 400
    t = rng.integers(1500, T * 10 - 3000, n).astype(np.int64)
    ch = rng.integers(0, 32, n).astype(np.int32)
    gain = rng.uniform(1e6, 3e6, n).astype(np.float32)

    # our path: photons already in the arena, one window, one piece
    arena_t = jnp.asarray(t.astype(np.int32))
    arena_ch = jnp.asarray(ch)
    arena_g = jnp.asarray(gain)
    pieces = np.zeros((1, 4, 3), np.int32)
    pieces[0, 0] = (0, n, 0)
    resA = gather_digitize(params, const, arena_t, arena_ch, arena_g,
                           jnp.asarray(pieces), jnp.zeros(1, jnp.int32),
                           n_samples=T, n_pieces=4, n_cap=512 if n <= 512 else 1024,
                           max_intervals=16)
    n_rec = int(resA['n_records'])
    packed = pack_records(resA['data'], resA['left_all'], resA['starts'],
                          resA['ends'], resA['itv_valid'],
                          n_channels_total=int(resA['data'].shape[1]),
                          n_samples=T, max_intervals=16,
                          max_records=2048)
    meta = np.asarray(packed['rec_meta'])[:n_rec]
    rdata = np.asarray(packed['rec_data'])[:n_rec]

    oracle = numpy_digitize(c, templates, t, ch, gain, T, const.n_tpc_pmts)

    ours = {}
    for i in range(n_rec):
        w, cch, start_s, length, plen, rec_i = meta[i]
        ours.setdefault(int(cch), []).append(
            (int(start_s), int(length), int(plen), int(rec_i), rdata[i]))

    assert set(ours) == set(oracle)
    for cch in oracle:
        assert len(ours[cch]) == len(oracle[cch]), f'channel {cch}'
        for got, ref in zip(ours[cch], oracle[cch]):
            assert got[0] == ref[0], (cch, 'left', got[0], ref[0])
            assert got[1] == ref[1], (cch, 'length')
            assert got[2] == ref[2], (cch, 'pulse_length')
            assert got[3] == ref[3], (cch, 'record_i')
            np.testing.assert_array_equal(got[4], ref[4].astype(np.int16),
                                          err_msg=f'channel {cch} payload')


@pytest.mark.parametrize('seed,gain_scale', [(0, 1.0), (3, 1.0), (0, 40.0)])
def test_encoded_transport_matches_dense_pack(seed, gain_scale):
    """pack_records_encoded + decode_records must reproduce pack_records'
    dense payload bit-for-bit (the wire encoding is lossless).

    gain_scale=40 drives bright overlapping pulses whose sample-to-sample
    steps exceed the int8 DPCM range, exercising the escape stream."""
    from wfsim_tpu.pipeline.digitize import (pack_records_encoded,
                                             decode_records,
                                             expand_interval_meta)
    c = default_config()
    res = load_config(c)
    params = build_params(c, res)
    const = build_constants(c)

    rng = np.random.default_rng(seed)
    T = 1024
    n = 400
    t = rng.integers(1500, T * 10 - 3000, n).astype(np.int64)
    ch = rng.integers(0, 32, n).astype(np.int32)
    gain = (gain_scale * rng.uniform(1e6, 3e6, n)).astype(np.float32)

    pieces = np.zeros((1, 4, 3), np.int32)
    pieces[0, 0] = (0, n, 0)
    resA = gather_digitize(params, const,
                           jnp.asarray(t.astype(np.int32)), jnp.asarray(ch),
                           jnp.asarray(gain), jnp.asarray(pieces),
                           jnp.zeros(1, jnp.int32),
                           n_samples=T, n_pieces=4, n_cap=512,
                           max_intervals=16)
    n_rec = int(resA['n_records'])
    n_val = int(resA['n_values'])
    assert n_rec > 0
    kw = dict(n_channels_total=int(resA['data'].shape[1]),
              n_samples=T, max_intervals=16, max_records=2048)
    dense = pack_records(resA['data'], resA['left_all'], resA['starts'],
                         resA['ends'], resA['itv_valid'], **kw)
    enc = pack_records_encoded(resA['data'], resA['left_all'],
                               resA['starts'], resA['ends'],
                               resA['itv_valid'], max_values=65536,
                               baseline=int(c['digitizer_reference_baseline']),
                               **kw)
    n_itv = int(resA['n_intervals'])
    meta_d = np.asarray(dense['rec_meta'])[:n_rec]
    m = expand_interval_meta(np.asarray(enc['itv_meta'])[:n_itv])
    assert len(m[0]) == n_rec
    np.testing.assert_array_equal(meta_d, np.stack(m[:6], axis=1))
    # n_values from gather_digitize is an upper bound on (and in the exact
    # regimes equal to) the encoder's actual count
    masks = np.asarray(enc['rec_masks'])[:n_rec]
    nnz = int(np.unpackbits(masks, axis=1, count=110).sum())
    assert nnz <= n_val, (nnz, n_val)
    assert n_val <= int(1.1 * nnz) + 64, (nnz, n_val)
    n_esc = int(enc['n_escapes'])
    if gain_scale > 1:
        assert n_esc > 0   # the bright case must actually exercise escapes
    decoded = decode_records(m[3], masks,
                             np.asarray(enc['rec_values'])[:n_val],
                             np.asarray(enc['rec_escapes'])[:max(n_esc, 1)],
                             int(c['digitizer_reference_baseline']))
    np.testing.assert_array_equal(decoded,
                                  np.asarray(dense['rec_data'])[:n_rec])
    # the device's compact mask transport must agree with the numpy
    # reference compressor (same <=2-run rule, same escape compaction)
    from wfsim_tpu.pipeline.digitize import compact_mask4, expand_mask4
    m4_ref, mesc_ref = compact_mask4(masks)
    m4_dev = np.asarray(enc['rec_mask4'])[:n_rec]
    np.testing.assert_array_equal(m4_dev, m4_ref)
    n_mesc = int((m4_dev[:, 0] == 255).sum())
    mesc_dev = np.asarray(enc['rec_mask_esc'])[:n_mesc]
    np.testing.assert_array_equal(mesc_dev, mesc_ref)
    np.testing.assert_array_equal(expand_mask4(m4_dev, mesc_dev), masks)


def test_noise_slice_path_matches_pointwise():
    """The contiguous-slice noise overlay (extended bank) must reproduce the
    modular pointwise gather bit-for-bit — same ZLE records either way."""
    import dataclasses
    from wfsim_tpu.config import default_config

    c = default_config(enable_noise=True)
    res = load_config(c)
    params = build_params(c, res)
    const = build_constants(c)
    assert params.noise_ext is not None

    rng = np.random.default_rng(2)
    T = 1024
    n = 500
    t = rng.integers(1500, T * 10 - 3000, n).astype(np.int32)
    ch = rng.integers(0, 64, n).astype(np.int32)
    gain = rng.uniform(1e6, 3e6, n).astype(np.float32)
    pieces = np.zeros((2, 4, 3), np.int32)
    pieces[0, 0] = (0, n // 2, 0)
    pieces[1, 0] = (n // 2, n - n // 2, 0)

    nix = jnp.asarray([123, 4567], jnp.int32)

    def run(p):
        return gather_digitize(p, const, jnp.asarray(t), jnp.asarray(ch),
                               jnp.asarray(gain), jnp.asarray(pieces),
                               nix, n_samples=T, n_pieces=4,
                               n_cap=512, max_intervals=16)

    a = run(params)
    b = run(dataclasses.replace(params, noise_ext=None))
    np.testing.assert_array_equal(np.asarray(a['data']), np.asarray(b['data']))
    for k in ('starts', 'ends', 'itv_valid', 'n_records', 'n_values'):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)


def test_noise_residual_transport_bitwise():
    """With noise on, the device ships a SIGNAL-RESIDUAL payload (noise
    stripped after ZLE/saturation); decode_records + add_noise_host must
    reproduce the full noisy records bit-for-bit against a pointwise numpy
    oracle of the reference semantics (rawdata.py:398-458)."""
    from wfsim_tpu.pipeline.digitize import (pack_records_encoded,
                                             decode_records,
                                             expand_interval_meta,
                                             add_noise_host)
    c = default_config(enable_noise=True)
    res = load_config(c)
    params = build_params(c, res)
    const = build_constants(c)
    templates = make_templates(c['pe_pulse_ts'], c['pe_pulse_ys'])
    bank = np.asarray(res.noise_data)
    L = bank.shape[0]

    rng = np.random.default_rng(5)
    T = 1024
    n = 400
    t = rng.integers(1500, T * 10 - 3000, n).astype(np.int64)
    ch = rng.integers(0, 32, n).astype(np.int32)
    gain = rng.uniform(1e6, 3e6, n).astype(np.float32)
    nix = np.array([L // 3], np.int32)

    pieces = np.zeros((1, 4, 3), np.int32)
    pieces[0, 0] = (0, n, 0)
    resA = gather_digitize(params, const,
                           jnp.asarray(t.astype(np.int32)), jnp.asarray(ch),
                           jnp.asarray(gain), jnp.asarray(pieces),
                           jnp.asarray(nix),
                           n_samples=T, n_pieces=4, n_cap=512,
                           max_intervals=16)
    # the slim (TPC-rows-only) grid must engage: bank covers only TPC rows
    assert resA['data'].shape[1] == const.n_tpc_pmts
    n_rec = int(resA['n_records'])
    n_val = int(resA['n_values'])
    n_itv = int(resA['n_intervals'])
    enc = pack_records_encoded(resA['data'], resA['left_all'],
                               resA['starts'], resA['ends'],
                               resA['itv_valid'],
                               n_channels_total=int(resA['data'].shape[1]),
                               n_samples=T, max_intervals=16,
                               max_records=4096, max_values=1 << 17,
                               baseline=int(c['digitizer_reference_baseline']))
    m = expand_interval_meta(np.asarray(enc['itv_meta'])[:n_itv])
    assert len(m[0]) == n_rec
    n_esc = int(enc['n_escapes'])
    decoded = decode_records(m[3], np.asarray(enc['rec_masks'])[:n_rec],
                             np.asarray(enc['rec_values'])[:n_val],
                             np.asarray(enc['rec_escapes'])[:max(n_esc, 1)],
                             int(c['digitizer_reference_baseline']))
    add_noise_host(decoded, m[1], m[2], m[3], m[6], nix[m[0]], bank)

    # oracle: full noisy digitize, pointwise numpy
    oracle = numpy_digitize(c, templates, t, ch, gain, T, const.n_tpc_pmts,
                            noise=(bank, int(nix[0])))
    ours = {}
    for i in range(n_rec):
        ours.setdefault(int(m[1][i]), []).append(
            (int(m[2][i]), int(m[3][i]), int(m[4][i]), int(m[5][i]),
             decoded[i]))
    oracle = {k: v for k, v in oracle.items() if v}
    assert set(ours) == set(oracle)
    n_checked = 0
    for cch in oracle:
        assert len(ours[cch]) == len(oracle[cch]), f'channel {cch}'
        for got, ref in zip(ours[cch], oracle[cch]):
            assert got[:4] == ref[:4], (cch, got[:4], ref[:4])
            np.testing.assert_array_equal(got[4], ref[4].astype(np.int16),
                                          err_msg=f'channel {cch} payload')
            n_checked += 1
    assert n_checked > 10
