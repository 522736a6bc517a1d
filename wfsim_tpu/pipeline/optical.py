"""Optical-input raw data: photons come from a GEANT4 photon list instead of
S1 physics (reference: wfsim/core/rawdata.py:461-496 ``RawDataOptical``).

Type-1 instructions carry ``_first``/``_last`` indices into the provided
(channels, timings) photon arrays; the PMT response, afterpulses,
digitization and ZLE are identical to the standard chain.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..models.pmt import pmt_response, photon_time_stats
from .rawdata import RawDataTPU, _bucket

__all__ = ['RawDataOpticalTPU']


def _optical_response(params, const, t, ch, valid, truth_row, row_edges, key,
                      *, n_truth_rows):
    photons, truth = pmt_response(params, const, t, ch, valid, truth_row, key,
                                  n_truth_rows=n_truth_rows,
                                  row_edges=row_edges)
    stats = photon_time_stats(photons['t'], photons['valid'],
                              photons['truth_row'], n_truth_rows,
                              row_edges=row_edges)
    truth.update({'photon_' + k: v for k, v in stats.items()})
    truth['n_electron'] = jnp.zeros(n_truth_rows, jnp.int32)
    return photons, truth


_optical_jit = jax.jit(_optical_response,
                       static_argnames=('const', 'n_truth_rows'))


class RawDataOpticalTPU(RawDataTPU):

    def __init__(self, config, channels=tuple(), timings=tuple(), **kwargs):
        super().__init__(config, **kwargs)
        self.channels = np.asarray(channels, dtype=np.int32)
        self.timings = np.asarray(timings, dtype=np.int64)

    def _dispatch_type_batch(self, instructions, idx, kind, want_gen):
        if kind != 's1':
            return super()._dispatch_type_batch(instructions, idx, kind,
                                                want_gen)
        # Optical primary: photon list from file (reference rawdata.py:475-493)
        sel = instructions[idx]
        base_time = int(np.min(sel['time']))
        cutoff = int(self.config.get('nveto_time_max_cutoff', int(1e6)))

        t_list, ch_list, row_list = [], [], []
        for r, ins in enumerate(sel):
            lo, hi = int(ins['_first']), int(ins['_last'])
            tt = self.timings[lo:hi]
            cc = self.channels[lo:hi]
            ok = (tt >= 0) & (tt < cutoff)
            t_list.append(tt[ok] + (int(ins['time']) - base_time))
            ch_list.append(cc[ok])
            row_list.append(np.full(ok.sum(), r, np.int32))
        t = np.concatenate(t_list) if t_list else np.zeros(0, np.int64)
        ch = np.concatenate(ch_list) if ch_list else np.zeros(0, np.int32)
        row = np.concatenate(row_list) if row_list else np.zeros(0, np.int32)

        n = len(t)
        cap = _bucket(max(n, 1))
        n_rows_cap = _bucket(len(sel), lo=8, hi=2 ** 16)
        tt = np.zeros(cap, np.int32)
        tt[:n] = t.astype(np.int32)
        cc = np.zeros(cap, np.int32)
        cc[:n] = ch
        # padded slots carry the last row so truth_row stays ascending for
        # the cumsum-based truth counters (models/pmt.py); masked to zero
        rr = np.full(cap, n_rows_cap - 1, np.int32)
        rr[:n] = row
        vv = np.zeros(cap, bool)
        vv[:n] = True

        # per-instruction slot layout: photons were packed contiguously per
        # instruction on the host above
        req = np.array([len(tl) for tl in t_list], np.int64)
        row_edges = np.zeros(n_rows_cap + 1, np.int32)
        row_edges[1:len(req) + 1] = np.cumsum(req)
        row_edges[len(req) + 1:] = row_edges[len(req)]

        photons, truth = _optical_jit(
            self.params, self.const, jnp.asarray(tt), jnp.asarray(cc),
            jnp.asarray(vv), jnp.asarray(rr), jnp.asarray(row_edges),
            self._next_key(), n_truth_rows=n_rows_cap)

        job = dict(kind='s1', idx=idx, base_time=base_time,
                   row_members=[[i] for i in range(len(sel))],
                   n_rows_cap=n_rows_cap, inst=None, key=None,
                   cap=cap, ecap=0, photons=photons,
                   truth_pack=self._pack_device(
                       dict(truth, _req=jnp.asarray(req.astype(np.int32)))))

        if self.const.enable_pmt_afterpulses and \
                self.params.pmt_ap_delay_cdf is not None:
            from ..models.afterpulse import pmt_afterpulse_photons
            ap_cap = _bucket(max(cap // 16, 256))
            ap_key = self._next_key()
            ap_photons, ap_info = pmt_afterpulse_photons(
                self.params, self.const, photons, ap_key,
                ap_capacity=ap_cap, n_truth_rows=n_rows_cap)
            job.update(ap_photons=ap_photons, ap_key=ap_key, ap_cap=ap_cap,
                       ap_pack=self._pack_device(
                           {k: ap_info[k] for k in ('counts', 't_min',
                                                    't_max', 'total')}))
        return job
