"""Per-stage device timing at bench-like shapes (one sync per stage).

Times simulate_s1, simulate_s2, gather_digitize and pack_records_encoded
separately with realistic bench shapes, so device compute can be attributed
per kernel (the pipeline overlaps these, so phase timers can't).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from wfsim_tpu.config import default_config
from wfsim_tpu.resources.loader import load_config
from wfsim_tpu.models.params import build_params, build_constants
from wfsim_tpu.models.s1 import simulate_s1
from wfsim_tpu.models.s2 import simulate_s2
from wfsim_tpu.pipeline.digitize import gather_digitize, pack_records_encoded


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return np.asarray(leaves[0].reshape(-1)[:1])


def timeit(name, fn, *args, **kw):
    out = fn(*args, **kw)   # compile
    sync(out)
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    sync(out)
    print(f'{name}: {time.perf_counter() - t0:.3f}s', flush=True)
    return out


def main():
    config = default_config()
    resource = load_config(config)
    params = build_params(config, resource)
    const = build_constants(config)
    rng = np.random.default_rng(0)
    key = jax.random.key(0)

    n = 512
    base = dict(
        time=jnp.asarray(np.arange(n) % 64 * 30_000, jnp.int32),
        x=jnp.asarray(rng.uniform(-40, 40, n), jnp.float32),
        y=jnp.asarray(rng.uniform(-40, 40, n), jnp.float32),
        z=jnp.asarray(rng.uniform(-90, -10, n), jnp.float32),
        recoil=jnp.full(n, 7, jnp.int32),
        valid=jnp.ones(n, bool),
        truth_row=jnp.asarray(np.arange(n), jnp.int32),
    )
    inst_s1 = dict(base, amp=jnp.full(n, 2000, jnp.int32))
    inst_s2 = dict(base, amp=jnp.full(n, 300, jnp.int32))

    timeit('simulate_s1 512x2000 (cap 2^21)', simulate_s1,
           params, const, inst_s1, key, capacity=2 ** 21, n_truth_rows=512)
    timeit('simulate_s2 512x300 (e 2^18, ph 2^21)', simulate_s2,
           params, const, inst_s2, key, e_capacity=2 ** 18,
           capacity=2 ** 21, n_truth_rows=512)

    # digitize: S2-like window batch (T=8192, 8 windows) and S1-like
    # (T=1024, 64 windows)
    A = 2 ** 20
    arena_t = jnp.asarray(rng.integers(0, 60000, A), jnp.int32)
    arena_ch = jnp.asarray(rng.integers(0, 494, A), jnp.int32)
    arena_g = jnp.asarray(rng.uniform(1e6, 3e6, A), jnp.float32)

    for (B, T, npp) in ((8, 8192, 3000), (64, 1024, 160)):
        pieces = np.zeros((B, 4, 3), np.int32)
        for b in range(B):
            pieces[b, 0] = (b * npp, npp, 0)
        n_cap = 1 << int(np.ceil(np.log2(npp + 1)))
        res = timeit(f'gather_digitize B={B} T={T} n={npp}',
                     gather_digitize, params, const,
                     arena_t, arena_ch, arena_g, jnp.asarray(pieces),
                     jnp.zeros(B, jnp.int32), n_samples=T, n_pieces=4, n_cap=n_cap, max_intervals=64)
        n_rec = int(res['n_records'])
        n_val = int(res['n_values'])
        mr = 1 << int(np.ceil(np.log2(max(n_rec, 2))))
        mv = 1 << int(np.ceil(np.log2(max(n_val, 2))))
        timeit(f'pack_encoded B={B} T={T} R={mr} V={mv}',
               pack_records_encoded, res['data'], res['left_all'],
               res['starts'], res['ends'], res['itv_valid'],
               n_channels_total=int(res['data'].shape[1]), n_samples=T,
               max_intervals=64, max_records=mr, max_values=mv,
               baseline=int(config['digitizer_reference_baseline']))


if __name__ == '__main__':
    main()
