"""Tunnel fetch-bandwidth probe: single big fetch vs sliced async fetches
vs threaded concurrent fetches. Not part of the framework — measurement only.
"""
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax
import jax.numpy as jnp

N = 100 * 1024 * 1024   # bytes target
rows = N // (110 * 2)
x = jnp.ones((rows, 110), jnp.int16)
x = (x + jnp.arange(110, dtype=jnp.int16)[None, :]).block_until_ready()
print('array MB:', x.nbytes / 1e6, 'backend:', jax.default_backend())

# 1. one big fetch
t0 = time.perf_counter()
a = np.asarray(x)
dt = time.perf_counter() - t0
print(f'single fetch: {dt:.2f}s  {x.nbytes/1e6/dt:.1f} MB/s')

# 2. sliced, async-started, sequential asarray
for k in (4, 16):
    sl = [x[i * rows // k:(i + 1) * rows // k] for i in range(k)]
    for s in sl:
        s.copy_to_host_async()
    t0 = time.perf_counter()
    parts = [np.asarray(s) for s in sl]
    dt = time.perf_counter() - t0
    print(f'{k} async slices: {dt:.2f}s  {x.nbytes/1e6/dt:.1f} MB/s')

# 3. threaded concurrent asarray on slices
for k, workers in ((8, 4), (16, 8)):
    sl = [x[i * rows // k:(i + 1) * rows // k] for i in range(k)]
    for s in sl:
        s.copy_to_host_async()
    t0 = time.perf_counter()
    with ThreadPoolExecutor(workers) as ex:
        parts = list(ex.map(np.asarray, sl))
    dt = time.perf_counter() - t0
    print(f'{k} slices x {workers} threads: {dt:.2f}s  '
          f'{x.nbytes/1e6/dt:.1f} MB/s')

# 4. jax.device_get on the whole thing (baseline check)
t0 = time.perf_counter()
b = jax.device_get(x)
dt = time.perf_counter() - t0
print(f'device_get: {dt:.2f}s  {x.nbytes/1e6/dt:.1f} MB/s')
