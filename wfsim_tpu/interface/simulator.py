"""Standalone simulator front end.

Provides the plugin-level behaviour of the reference's ``SimulatorPlugin``
(config resolution, instruction acquisition, sanity checks, chunked
iteration; reference: wfsim/strax_interface.py:506-714) without requiring
strax.  The strax plugins in interface/strax_plugins.py wrap this same
machinery when strax is installed.
"""
from __future__ import annotations

import logging
import typing as ty

import numpy as np

from ..config import default_config, finalize_config, load_fax_config
from ..dtypes import instruction_dtype
from ..pipeline.chunker import ChunkRawRecords
from .instructions import rand_instructions, instruction_from_csv

log = logging.getLogger('wfsim_tpu.interface')

__all__ = ['Simulator']


class Simulator:
    """instructions -> iterator of {raw_records*, truth} chunk dicts.

    Usage::

        sim = Simulator(fax_config='path/to/fax.json',
                        fax_config_override={'enable_noise': True})
        for chunk in sim.run(instructions):
            ...
    """

    def __init__(self, config: ty.Optional[dict] = None,
                 fax_config: ty.Optional[str] = None,
                 fax_config_override: ty.Optional[dict] = None,
                 mesh=None,
                 **overrides):
        """``mesh``: optional jax.sharding.Mesh with an 'events' axis — runs
        the production pipeline sharded over multiple chips (see
        RawDataTPU); output is identical to the single-device run."""
        if config is None:
            config = default_config()
        else:
            config = dict(config)
        if fax_config:
            config.update(load_fax_config(fax_config))
        if fax_config_override:
            config.update(fax_config_override)
        config.update(overrides)
        self.config = finalize_config(config)
        if self.config.get('seed'):
            np.random.seed(self.config['seed'])
        self.sim = ChunkRawRecords(self.config, mesh=mesh)

    # -- instruction handling (reference: strax_interface.py:674-693) -------

    def get_instructions(self) -> np.ndarray:
        fax_file = self.config.get('fax_file')
        if fax_file:
            assert not str(fax_file).endswith('root'), \
                'Non-optical G4 input is deprecated, use epix instructions'
            assert str(fax_file).endswith('csv'), 'Only csv input is supported'
            return instruction_from_csv(fax_file)
        return rand_instructions(self.config)

    def check_instructions(self, instructions: np.ndarray) -> np.ndarray:
        # Let below-cathode S1s pass but remove below-cathode S2s
        m = ((instructions['z'] < -self.config['tpc_length'])
             & (instructions['type'] == 2))
        instructions = instructions[~m]
        r = np.sqrt(instructions['x'] ** 2 + instructions['y'] ** 2)
        assert np.all((r < self.config['tpc_radius'])
                      | np.isclose(r, self.config['tpc_radius'])), \
            'Interaction is outside the TPC (radius)'
        assert np.all(instructions['z'] < 0.25), \
            'Interaction is outside the TPC (in Z)'
        assert np.all(instructions['amp'] > 0), 'Interaction has zero size'
        return instructions

    # -- execution ------------------------------------------------------------

    def run(self, instructions: ty.Optional[np.ndarray] = None,
            time_zero: ty.Optional[int] = None):
        """Yield chunk dicts; enforces the reference's stream invariants
        (sortedness, >=1 us chunk spacing; strax_interface.py:622-640)."""
        if instructions is None:
            instructions = self.get_instructions()
        instructions = self.check_instructions(np.asarray(instructions))
        last_chunk_time = -999_999_999_999_999
        for result in self.sim(instructions, time_zero=time_zero):
            rr = result.get('raw_records')
            if rr is not None and len(rr):
                if rr['time'][0] < last_chunk_time + 1000:
                    raise RuntimeError(
                        'Simulator returned chunks with insufficient spacing')
                if len(rr) > 1 and np.diff(rr['time']).min() < 0:
                    raise RuntimeError('Simulator returned non-sorted records')
                last_chunk_time = max(int(rr['time'].max()), last_chunk_time)
            result['start'] = int(self.sim.chunk_time_pre)
            result['end'] = int(self.sim.chunk_time)
            yield result

    def get_arrays(self, instructions: ty.Optional[np.ndarray] = None):
        """Run to completion and concatenate all chunks."""
        from ..dtypes import concat_records
        outs: ty.Dict[str, list] = {}
        for chunk in self.run(instructions):
            for k, v in chunk.items():
                if isinstance(v, np.ndarray):
                    outs.setdefault(k, []).append(v)

        def cat(v):
            if len(v) == 1:
                return v[0]
            if any(len(x) for x in v):
                # np.concatenate is pathologically slow for subarray-field
                # structured dtypes (see dtypes.concat_records)
                return concat_records(v)
            return v[0]
        return {k: cat(v) for k, v in outs.items()}

    def source_finished(self):
        return self.sim.source_finished()
