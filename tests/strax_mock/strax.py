"""Test-only strax stand-in (see tests/strax_mock/__init__.py)."""
import numpy as np

from wfsim_tpu.dtypes import raw_record_dtype as _raw_record_dtype

OMITTED = '<OMITTED>'


class Option:
    def __init__(self, name, default=OMITTED, track=True, infer_type=True,
                 type=None, help=''):
        self.name = name
        self.default = default
        self.track = track
        self.type = type
        self.help = help


def takes_config(*options):
    def wrap(cls):
        existing = dict(getattr(cls, 'takes_config', {}))
        existing.update({o.name: o for o in options})
        cls.takes_config = existing
        return cls
    return wrap


class Chunk:
    def __init__(self, start, end, data, data_type):
        self.start = int(start)
        self.end = int(end)
        self.data = data
        self.data_type = data_type

    def __len__(self):
        return len(self.data)


class Plugin:
    takes_config = {}
    provides = ()
    depends_on = ()

    def __init__(self, config=None, run_id='000000'):
        c = {}
        for name, opt in self.takes_config.items():
            if opt.default is not OMITTED:
                c[name] = opt.default
        c.update(config or {})
        self.config = c
        self.run_id = run_id

    def infer_dtype(self):
        raise NotImplementedError

    def dtype_for(self, data_type):
        if not hasattr(self, 'dtype'):
            self.dtype = self.infer_dtype()
        d = self.dtype
        if isinstance(d, dict):
            d = d[data_type]
        return np.dtype(d)

    def chunk(self, *, start, end, data, data_type):
        return Chunk(start, end, data, data_type)


def raw_record_dtype(samples_per_record=110):
    return _raw_record_dtype(samples_per_record)


class DataDirectory:
    def __init__(self, path='./strax_data', **kwargs):
        self.path = path


class Context:
    """Registry + config container (the slice of strax.Context the wfsim
    context factories drive: register, set_config, config mapping,
    _plugin_class_registry, apply_cmt_version)."""

    def __init__(self, storage=None, config=None, **kwargs):
        self.storage = storage
        self.config = dict(config or {})
        self.context_config = dict(kwargs)
        self._plugin_class_registry = {}
        for plugin in kwargs.get('register', ()) or ():
            self.register(plugin)

    def register(self, plugin_cls):
        provides = plugin_cls.provides
        if isinstance(provides, str):
            provides = (provides,)
        for p in provides:
            self._plugin_class_registry[p] = plugin_cls
        return plugin_cls

    def set_config(self, config):
        self.config.update(config)

    def apply_cmt_version(self, version):
        self.applied_cmt_version = version
