"""Test-only straxen stand-in (see tests/strax_mock/__init__.py)."""
import json
import os


class URLConfig:
    """Descriptor mirroring straxen.URLConfig's plugin-attribute behaviour:
    reads the concrete value set in plugin.config, falling back to the
    default. URL-protocol resolution (cmt://...) is not available here —
    tests must set concrete values, like the reference's no-database CI leg.
    """

    def __init__(self, default=None, track=True, infer_type=False, help=''):
        self.default = default

    def __set_name__(self, owner, name):
        self.name = name

    def __get__(self, obj, objtype=None):
        if obj is None:
            return self
        val = obj.config.get(self.name, self.default)
        if isinstance(val, str) and '://' in val:
            raise RuntimeError(
                f'URLConfig {self.name!r}: protocol URLs (got {val!r}) need '
                f'real straxen; set a concrete value in the test config')
        return val


def get_resource(name, fmt='json'):
    """Local-file JSON fetch; missing names resolve to {} so tests supply
    the full physics config via fax_config_override."""
    if name and os.path.exists(str(name)):
        with open(name) as f:
            return json.load(f) if fmt == 'json' else f.read()
    return {}


def get_correction_from_cmt(run_id, cmt_option):
    raise RuntimeError('CMT is not available in the test shim')


class _Contexts:
    """Stand-in for straxen.contexts: common config/opts dicts only (no
    xenonnt_simulation attr, so wfsim's offline factory takes its
    strax.Context fallback branch)."""
    xnt_common_config = {
        'n_tpc_pmts': 494,
        'n_top_pmts': 253,
        'channel_map': {'tpc': (0, 493), 'he': (500, 752),
                        'aqmon': (790, 807), 'nveto': (2000, 2119),
                        'sum_signal': 800},
    }
    xnt_common_opts = {}
    x1t_common_config = {
        'n_tpc_pmts': 248,
        'n_top_pmts': 127,
        'channel_map': {'tpc': (0, 247), 'diagnostic': (248, 253),
                        'aqmon': (254, 263), 'sum_signal': 800},
    }
    x1t_context_config = {}


contexts = _Contexts()


class _GetCorrections:
    @staticmethod
    def get_cmt_options(st):
        return {
            'gain_model': {'strax_option': ('to_pe_model', 'ONLINE')},
            'elife': {'strax_option': ('elife', 'ONLINE')},
            'electron_drift_velocity': {
                'strax_option': ('electron_drift_velocity', 'ONLINE')},
            'electron_drift_time_gate': {
                'strax_option': ('electron_drift_time_gate', 'ONLINE')},
        }


get_corrections = _GetCorrections()
