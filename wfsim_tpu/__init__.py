"""wfsim_tpu — a TPU-native waveform simulator for dual-phase xenon TPCs.

Same capabilities and I/O contracts as XENONnT/WFSim (instructions in,
strax raw_records + truth out), redesigned for JAX/XLA/Pallas on TPU:
fixed-shape vmapped Monte Carlo for the physics chain, a dense
histogram+convolution kernel for PMT pulse synthesis, vectorized
zero-length encoding, and shard_map event parallelism over device meshes.
"""
__version__ = '0.1.0'

from .units import *                        # noqa: F401,F403
from . import units                         # noqa: F401
from .dtypes import (                       # noqa: F401
    instruction_dtype, optical_extra_dtype, truth_extra_dtype,
    extra_truth_dtype_per_pmt, raw_record_dtype, DEFAULT_RECORD_LENGTH,
    PULSE_TYPE_NAMES)
from .config import (                       # noqa: F401
    default_config, load_fax_config, finalize_config, deterministic_hash)
