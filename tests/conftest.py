import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware.  NOTE: this environment pre-sets
# JAX_PLATFORMS=axon (the TPU tunnel), which shadows JAX_PLATFORMS=cpu —
# JAX_PLATFORM_NAME is the override that actually wins, so set both.
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['JAX_PLATFORM_NAME'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
