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
