"""Execute the strax plugin layer against the vendored shim.

Mirrors the shape of the reference's integration tests
(/root/reference/tests/test_wfsim.py:30-64: build plugin, setup, pull
chunks, sanity-check records+truth) without a real strax install:
tests/strax_mock provides the minimal strax/straxen/immutabledict surface
and wfsim_tpu.interface.strax_plugins is reloaded against it.
"""
import importlib
import sys
import types

import numpy as np
import pytest

from wfsim_tpu.config import default_config, CHANNEL_MAPS
from wfsim_tpu.dtypes import instruction_dtype


@pytest.fixture
def sp():
    import tests.strax_mock.strax as strax_m
    import tests.strax_mock.straxen as straxen_m
    import tests.strax_mock.immutabledict as imm_m
    names = ('strax', 'straxen', 'immutabledict')
    saved = {k: sys.modules.get(k) for k in names}
    sys.modules['strax'] = strax_m
    sys.modules['straxen'] = straxen_m
    sys.modules['immutabledict'] = imm_m
    import wfsim_tpu.interface.strax_plugins as m
    import wfsim_tpu.interface.contexts as ctx
    importlib.reload(m)
    importlib.reload(ctx)
    assert m.HAVE_STRAX
    try:
        yield m
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
        importlib.reload(m)
        importlib.reload(ctx)


def _base_config(**extra):
    from tests.strax_mock.immutabledict import immutabledict
    over = default_config()
    over['seed'] = 7
    # default_config() doubles as the fax JSON here, and set_config applies
    # it over the plugin options — pin the plugin-level knobs in it too
    over.update(event_rate=2, chunk_size=1, n_chunk=2)
    over.update({k: v for k, v in extra.items() if k in over})
    c = dict(
        detector='XENONnT',
        event_rate=2, chunk_size=1, n_chunk=2, seed=7,
        fax_config='no_such_fax_config.json',   # shim resolves to {}
        fax_config_override=over,
        channel_map=immutabledict(CHANNEL_MAPS['XENONnT']['channel_map']),
        n_tpc_pmts=494, n_top_pmts=253,
        gain_model_mc=np.full(494, 0.0085),
    )
    c.update(extra)
    return c


def test_fax_nt_two_chunk_compute(sp):
    """RawRecordsFromFaxNT.setup() + a two-chunk compute loop
    (reference scale: tests/test_wfsim.py:44 runs 2 chunks x 1 s)."""
    p = sp.RawRecordsFromFaxNT(config=_base_config())
    p.setup()
    assert len(p.instructions) > 0

    n_records = 0
    starts = []
    for _ in range(2):
        out = p.compute()
        assert set(out) == set(p.provides)
        rr = out['raw_records']
        assert rr.data.dtype == p.dtype_for('raw_records')
        assert rr.end >= rr.start
        starts.append(rr.start)
        n_records += len(rr.data)
        truth = out['truth'].data
        assert truth.dtype == p.dtype_for('truth')
        if len(rr.data) > 1:
            assert np.diff(rr.data['time']).min() >= 0
    assert n_records > 0
    assert starts[1] > starts[0]
    assert p.source_finished()


def test_fax_nt_three_chunk_strax_invariants(sp):
    """Hold the plugin layer to strax's REAL stream contracts over a 3+
    chunk run, not just the shim's (round-4 verdict item 8):

    - per-chunk time-sortedness and >=1 us spacing to the previous chunk
      (the reference's _sort_check, strax_interface.py:622-640),
    - chunk boundaries monotone and records contained in [start, end),
    - strax.check_raw_record_overlaps semantics: no two records of one
      channel overlap in time (re-derived here, not imported).
    """
    cfg = _base_config()
    cfg['fax_config_override'] = dict(cfg['fax_config_override'],
                                      event_rate=3, chunk_size=1, n_chunk=3)
    cfg.update(event_rate=3, chunk_size=1, n_chunk=3)
    p = sp.RawRecordsFromFaxNT(config=cfg)
    p.setup()
    dt = 10                                   # XENONnT sample_duration

    last_chunk_end_time = None
    prev_chunk_end = None
    total = 0
    while not p.source_finished():
        out = p.compute()
        rr = out['raw_records']
        data = rr.data
        assert rr.end >= rr.start
        if prev_chunk_end is not None:
            assert rr.start >= prev_chunk_end
        prev_chunk_end = rr.end
        if not len(data):
            continue
        total += len(data)
        # sortedness within the chunk
        assert np.diff(data['time'].astype(np.int64)).min() >= 0
        # >= 1 us inter-chunk spacing (reference _sort_check)
        if last_chunk_end_time is not None:
            assert int(data['time'][0]) >= last_chunk_end_time + 1000
        last_chunk_end_time = int(data['time'][-1])
        # containment in the chunk bounds
        assert int(data['time'][0]) >= rr.start
        ends = data['time'].astype(np.int64) + \
            data['length'].astype(np.int64) * dt
        assert int(ends.max()) <= rr.end
        # check_raw_record_overlaps: per channel, record intervals must
        # not overlap
        order = np.lexsort((data['time'], data['channel']))
        d = data[order]
        same_ch = d['channel'][1:] == d['channel'][:-1]
        prev_end = (d['time'].astype(np.int64)
                    + d['length'].astype(np.int64) * dt)[:-1]
        assert np.all(~same_ch | (d['time'][1:].astype(np.int64)
                                  >= prev_end))
    assert total > 0


def test_fax_nt_sort_check_rejects_unsorted(sp):
    p = sp.RawRecordsFromFaxNT(config=_base_config())
    p.setup()
    bad = np.zeros(2, dtype=p.dtype_for('raw_records'))
    bad['time'] = [10_000_000, 5_000_000]
    with pytest.raises(RuntimeError, match='non-sorted'):
        p._sort_check(bad)


def test_context_factories(sp, tmp_path):
    """Construct every context factory and lint the plugin graph, like the
    reference's tests/test_contexts.py:10-28."""
    import wfsim_tpu.interface.contexts as ctx
    assert ctx.HAVE_STRAX

    st1 = ctx.xenon1t_simulation(output_folder=str(tmp_path))
    assert st1._plugin_class_registry['raw_records'] \
        is sp.RawRecordsFromFax1T
    assert st1.config['detector'] == 'XENON1T'

    st = ctx.xenonnt_simulation(output_folder=str(tmp_path),
                                cmt_run_id_sim='026000')
    for p in sp.RawRecordsFromFaxNT.provides:
        assert p in st._plugin_class_registry
    assert st.config['gain_model_mc'][:2] == ('cmt_run_id', '026000')
    assert set(st.config['fax_config_override_from_cmt']) == {
        'electron_lifetime_liquid', 'drift_velocity_liquid',
        'drift_time_gate'}
    # processing side pinned independently (divergent sim/proc CMT)
    st_div = ctx.xenonnt_simulation(output_folder=str(tmp_path),
                                    cmt_run_id_sim='026000',
                                    cmt_run_id_proc='027000')
    assert st_div.config['gain_model'][1] == '027000'
    assert st_div.config['gain_model_mc'][1] == '026000'
    with pytest.raises(RuntimeError, match='at least one CMT run id'):
        ctx.xenonnt_simulation(output_folder=str(tmp_path))

    st_off = ctx.xenonnt_simulation_offline(
        output_folder=str(tmp_path), run_id='026000',
        global_version='global_v9', fax_config='fax.json')
    assert st_off.applied_cmt_version == 'global_v9'
    assert st_off._plugin_class_registry['truth'] is sp.RawRecordsFromFaxNT
    with pytest.raises(ValueError):
        ctx.xenonnt_simulation_offline(output_folder=str(tmp_path))


def test_mc_chain_with_stub_epix(sp):
    """RawRecordsFromMcChain (tpc target) driven by a stub epix module:
    exercises the epix hand-off, the synchronized event clock (set_timing),
    in-TPC checks and the lock-step compute with empty nVeto outputs
    (reference: strax_interface.py:741-1005)."""
    n_ev = 4
    rng = np.random.default_rng(3)
    inst = np.zeros(2 * n_ev, dtype=instruction_dtype)
    inst['event_number'] = np.repeat(np.arange(n_ev), 2)
    inst['g4id'] = np.repeat(np.arange(n_ev), 2)
    inst['type'] = np.tile([1, 2], n_ev)
    inst['time'] = 0
    inst['x'] = np.repeat(rng.uniform(-30, 30, n_ev), 2)
    inst['y'] = np.repeat(rng.uniform(-30, 30, n_ev), 2)
    inst['z'] = np.repeat(rng.uniform(-80, -20, n_ev), 2)
    inst['amp'] = np.tile([300, 40], n_ev)
    inst['recoil'] = 7

    epix = types.ModuleType('epix')
    calls = {}

    def _main(cfg, return_wfsim_instructions=True):
        calls['config'] = cfg
        assert return_wfsim_instructions
        return inst.copy()

    epix.run_epix = types.SimpleNamespace(setup=lambda cfg: cfg, main=_main)
    sys.modules['epix'] = epix
    try:
        p = sp.RawRecordsFromMcChain(config=_base_config(
            targets=('tpc',), fax_file='stub.root', epix_config={},
            chunk_size=100, n_chunk=1))
        p.setup()
        assert calls['config']['input_file'] == 'stub.root'
        # the shared event clock placed every instruction on the grid
        assert np.all(p.instructions_epix['time'] > 0)

        out = p.compute()
        assert set(out) == set(p.provides)
        assert len(out['raw_records'].data) > 0
        assert len(out['truth'].data) == 2 * n_ev
        assert len(out['raw_records_nv'].data) == 0
        assert len(out['truth_nv'].data) == 0
        assert p.source_finished()
    finally:
        sys.modules.pop('epix', None)
