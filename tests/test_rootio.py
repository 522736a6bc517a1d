"""GEANT4/ROOT optical-input path, executed end-to-end against the
reference's own 3-event fixture (mirrors reference tests/test_wfsim.py:
190-245) using the vendored pure-python ROOT reader — no uproot needed."""
import os

import numpy as np
import pytest

from wfsim_tpu.resources import rootio

FIXTURE = '/root/reference/tests/geant_test_data_small.root'

pytestmark = pytest.mark.skipif(not os.path.exists(FIXTURE),
                                reason='reference GEANT4 fixture not present')


def test_rootio_reads_fixture_branches():
    events = rootio.open(FIXTURE).get('events')
    g4id = events['eventid'].array(library='np')
    np.testing.assert_array_equal(g4id, np.arange(10))

    ids = events['pmthitID'].array(library='np')
    times = events['pmthitTime'].array(library='np')
    energies = events['pmthitEnergy'].array(library='np')
    assert len(ids) == len(times) == len(energies) == 10
    n_hits = sum(len(a) for a in ids)
    assert n_hits > 100
    for a, b, c in zip(ids, times, energies):
        assert len(a) == len(b) == len(c)
        assert a.dtype.kind == 'i'
        assert b.dtype.kind == 'f' and b.dtype.itemsize == 8
        assert c.dtype.kind == 'f' and c.dtype.itemsize == 4
    # physical sanity: PMT ids in the nVeto range, times in seconds (< ms),
    # photon energies of a few eV
    all_ids = np.hstack(ids)
    assert (all_ids >= 2000).mean() > 0.9
    all_e = np.hstack(energies)
    assert 0.5 < np.median(all_e) < 20.0      # eV scale scintillation light
    all_t = np.hstack(times)
    assert np.all(np.isfinite(all_t)) and all_t.min() >= 0

    # flat leaf-list branches
    xp = events['xp_pri'].array(library='np')
    assert xp.dtype.kind == 'f' and xp.dtype.itemsize == 4 and len(xp) == 10


@pytest.mark.skipif(os.environ.get('WFSIM_TPU_SKIP_UPROOT_XCHECK', '1') == '0',
                    reason='explicit opt-out')
def test_rootio_matches_uproot_if_available():
    uproot = pytest.importorskip('uproot')
    a = rootio.open(FIXTURE).get('events')
    b = uproot.open(FIXTURE).get('events')
    for name in ('eventid', 'xp_pri'):
        np.testing.assert_array_equal(a[name].array(library='np'),
                                      b[name].array(library='np'))
    for name in ('pmthitID', 'pmthitTime'):
        aa = a[name].array(library='np')
        bb = b[name].array(library='np')
        assert len(aa) == len(bb)
        for x, y in zip(aa, bb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_read_optical_geant4_to_records_end_to_end():
    """read_optical on the reference fixture -> nVeto optical chain ->
    raw_records + truth (reference tests/test_wfsim.py:190-245 drives the
    same file through its nVeto simulation)."""
    from wfsim_tpu.config import default_config
    from wfsim_tpu.dtypes import optical_extra_dtype
    from wfsim_tpu.interface.instructions import read_optical
    from wfsim_tpu.pipeline.chunker import ChunkRawRecords
    from wfsim_tpu.pipeline.optical import RawDataOpticalTPU

    c = default_config(detector='XENONnT_neutron_veto')
    c['fax_file'] = FIXTURE
    c['seed'] = 4
    c['chunk_size'] = 1000
    c['_truth_extra_instruction_dtype'] = optical_extra_dtype

    ins, channels, timings = read_optical(c)
    assert len(ins) >= 10            # >1 us gaps may split instructions
    # split instruction ranges partition the photon list
    assert int((ins['_last'] - ins['_first']).sum()) == len(channels)
    assert len(channels) == len(timings)
    assert channels.min() >= 0 and channels.max() < 120
    assert np.all(np.diff(np.sort(ins['_first'])) >= 0)

    sim = ChunkRawRecords(c, rawdata_generator=RawDataOpticalTPU,
                          channels=channels, timings=timings)
    outs = list(sim(ins))
    rr = np.concatenate([o['raw_records'] for o in outs])
    truth = np.concatenate([o['truth'] for o in outs])
    assert len(rr) > 0
    assert len(truth) >= 10
    assert truth['n_photon'].sum() > 0
    assert rr['channel'].max() < 120
