import os

# Force the test suite onto a virtual 8-device CPU mesh so multi-chip
# sharding logic is exercised without TPU hardware.
#
# NOTE: this environment registers the 'axon' TPU backend from
# sitecustomize.py at interpreter start, so env vars set here are too late —
# the platform must be overridden through jax.config before first backend use.
# separate compile cache for the CPU test platform (TPU-built AOT entries
# spam feature-mismatch warnings when loaded into CPU processes)
os.environ.setdefault(
    'JAX_COMPILATION_CACHE_DIR',
    os.path.expanduser('~/.cache/wfsim_tpu_xla_cpu'))

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
assert jax.default_backend() == 'cpu'
