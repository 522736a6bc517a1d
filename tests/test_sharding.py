"""Multi-device sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wfsim_tpu.config import default_config
from wfsim_tpu.resources.loader import load_config
from wfsim_tpu.models.params import build_params, build_constants
from wfsim_tpu.parallel.sharding import make_mesh, make_sharded_step


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 virtual devices')
def test_sharded_step_events_by_channels():
    config = default_config()
    resource = load_config(config)
    params = build_params(config, resource)
    const = build_constants(config)

    mesh = make_mesh(4, 2)
    inst_per_shard = 4
    n_inst = inst_per_shard * mesh.shape['events']
    rng = np.random.default_rng(0)
    inst = dict(
        time=jnp.asarray((np.arange(n_inst) % inst_per_shard) * 100_000,
                         dtype=jnp.int32),
        x=jnp.asarray(rng.uniform(-40, 40, n_inst), dtype=jnp.float32),
        y=jnp.asarray(rng.uniform(-40, 40, n_inst), dtype=jnp.float32),
        z=jnp.asarray(rng.uniform(-90, -10, n_inst), dtype=jnp.float32),
        amp=jnp.asarray(rng.integers(50, 500, n_inst), dtype=jnp.int32),
        recoil=jnp.full(n_inst, 7, dtype=jnp.int32),
        type=jnp.asarray(np.tile([1, 2], n_inst // 2), dtype=jnp.int32),
        valid=jnp.ones(n_inst, dtype=bool),
        truth_row=jnp.asarray(np.arange(n_inst) % inst_per_shard,
                              dtype=jnp.int32),
    )
    step = make_sharded_step(params, const, mesh,
                             inst_per_shard=inst_per_shard,
                             photon_capacity=2048, electron_capacity=512,
                             n_samples=512)
    adc, sum_signal, totals = step(params, inst, jax.random.key(0))
    jax.block_until_ready((adc, sum_signal, totals))
    assert adc.ndim == 3
    assert int(totals[0]) > 0          # photons were produced
    assert int(totals[1]) >= int(totals[0])  # n_pe >= n_photon
    # grid is sharded over both mesh axes
    assert adc.shape[0] == mesh.shape['events']


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 virtual devices')
def test_graft_entry_dryrun():
    import importlib.util
    spec = importlib.util.spec_from_file_location('graft', '__graft_entry__.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    mod.dryrun_multichip(8)
