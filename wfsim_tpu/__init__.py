"""wfsim_tpu — a TPU-native waveform simulator for dual-phase xenon TPCs.

Same capabilities and I/O contracts as XENONnT/WFSim (instructions in,
strax raw_records + truth out), redesigned for JAX/XLA/Pallas on TPU:
fixed-shape vmapped Monte Carlo for the physics chain, a dense
histogram+convolution kernel for PMT pulse synthesis, vectorized
zero-length encoding, and shard_map event parallelism over device meshes.
"""
__version__ = '0.1.0'

import os as _os

# Keep large allocations on the reusable glibc heap (M_MMAP_THRESHOLD /
# M_TRIM_THRESHOLD).  By default glibc mmaps >128 kB allocations and
# returns them to the OS on free, so every fresh chunk-sized record array
# pays first-touch page faults again — measured at ~50 MB/s on
# virtualized hosts (6+ s per 200 MB bench chunk, the dominant host cost).
# With the heap retained, pages fault once per process. Opt out with
# WFSIM_TPU_NO_MALLOPT=1.
if not _os.environ.get('WFSIM_TPU_NO_MALLOPT'):
    try:
        import ctypes as _ctypes
        _libc = _ctypes.CDLL('libc.so.6', use_errno=True)
        _libc.mallopt(-3, 1 << 30)   # M_MMAP_THRESHOLD
        _libc.mallopt(-1, 1 << 30)   # M_TRIM_THRESHOLD
    except Exception:  # pragma: no cover - non-glibc platforms
        pass

# Persistent XLA compilation cache: the pipeline compiles one program per
# (photon-capacity, window-length) bucket; caching makes every process after
# the first start warm.  The directory is keyed by the host CPU's ISA
# signature: XLA:CPU stores AOT executables specialized to the build
# machine's features, and loading one on a host without those features
# SIGILLs (observed as a segfault inside get_executable_and_time when this
# repo's cache moved between machine types).  Opt out with
# WFSIM_TPU_NO_COMPILE_CACHE=1.  Explicit-CPU runs skip it entirely:
# XLA:CPU AOT (de)serialization is unreliable on this host class (SIGILL on
# cross-machine entries, observed write-side segfaults) and CPU compiles
# are cheap anyway.
if not _os.environ.get('WFSIM_TPU_NO_COMPILE_CACHE') \
        and _os.environ.get('JAX_PLATFORMS', '').strip().lower() != 'cpu' \
        and _os.environ.get('JAX_PLATFORM_NAME', '').strip().lower() != 'cpu':
    _cache_dir = _os.environ.get('JAX_COMPILATION_CACHE_DIR')
    if not _cache_dir:
        try:
            import hashlib as _hashlib
            with open('/proc/cpuinfo') as _fh:
                for _line in _fh:
                    if _line.startswith('flags'):
                        _sig = _hashlib.sha1(
                            _line.encode()).hexdigest()[:8]
                        break
                else:
                    _sig = 'nocpu'
        except Exception:  # pragma: no cover - non-linux
            _sig = 'nocpu'
        _cache_dir = _os.path.expanduser(f'~/.cache/wfsim_tpu_xla_{_sig}')
    try:
        import jax as _jax
        _jax.config.update('jax_compilation_cache_dir', _cache_dir)
        _jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from .units import *                        # noqa: F401,F403
from . import units                         # noqa: F401
from .dtypes import (                       # noqa: F401
    instruction_dtype, optical_extra_dtype, truth_extra_dtype,
    extra_truth_dtype_per_pmt, raw_record_dtype, DEFAULT_RECORD_LENGTH,
    PULSE_TYPE_NAMES)
from .config import (                       # noqa: F401
    default_config, load_fax_config, finalize_config, deterministic_hash)
from .resources import Resource, load_config, make_map, DummyMap  # noqa: F401
from .pipeline import (                      # noqa: F401
    RawDataTPU, RawDataOpticalTPU, ChunkRawRecords, digitize_window)
from .interface import (                     # noqa: F401
    Simulator, rand_instructions, random_instructions,
    instruction_from_csv, read_optical)
from .utils import optical_adjustment        # noqa: F401

# Aliases matching the reference's public names (wfsim/__init__.py exports
# everything flat; RawData/RawDataOptical are the core entry classes)
RawData = RawDataTPU
RawDataOptical = RawDataOpticalTPU

# strax plugin layer and contexts load lazily only when strax is installed
from .interface.strax_plugins import *       # noqa: F401,F403
from .interface.contexts import *            # noqa: F401,F403
