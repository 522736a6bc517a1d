"""Vectorized sampling primitives used by the physics models.

Everything here is shape-static and branch-free so it jits and vmaps cleanly.
Counter-based PRNG (jax threefry) replaces the reference's sequential global
``np.random`` state: keys are folded in per (chunk, cluster, stage), so any
cluster is reproducible in isolation — a capability the reference lacks
(it acknowledges this at wfsim/strax_interface.py:543-549).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    'categorical_from_cdf', 'sample_inverse_cdf', 'truncated_exponential',
    'binomial', 'poisson',
]


def binomial(key, n, p):
    """Binomial(n, p) elementwise. jax.random.binomial with guards for the
    degenerate edges the physics hits constantly (p<=0, n==0)."""
    n = jnp.asarray(n, dtype=jnp.float32)
    p = jnp.clip(jnp.asarray(p, dtype=jnp.float32), 0.0, 1.0)
    out = jax.random.binomial(key, n=jnp.maximum(n, 0.0), p=p)
    return jnp.where((n <= 0) | (p <= 0), 0.0, out).astype(jnp.int32)


def _threefry_key(key):
    """jax.random.poisson is threefry-only; when the session runs a faster
    default PRNG (e.g. rbg, which maps to the TPU hardware generator), fold
    the key's data into a threefry key just for the poisson draw."""
    try:
        if 'threefry' in str(jax.random.key_impl(key)):
            return key
        data = jax.random.key_data(key).reshape(-1)[:2]
        return jax.random.wrap_key_data(data, impl='threefry2x32')
    except Exception:
        return key


def poisson(key, lam):
    lam = jnp.asarray(lam, dtype=jnp.float32)
    out = jax.random.poisson(_threefry_key(key), jnp.maximum(lam, 0.0))
    return jnp.where(lam <= 0, 0, out).astype(jnp.int32)


def categorical_from_cdf(cdf_rows: jnp.ndarray,
                         row_idx: jnp.ndarray,
                         u: jnp.ndarray) -> jnp.ndarray:
    """Per-sample categorical draw via binary search on per-row CDFs.

    Replaces the reference's per-event ``np.random.choice(channels, p=pattern)``
    loops (wfsim/core/s1.py:152-158, s2.py:657-679) with a memory-lean
    vectorized inverse-CDF search: log2(C) rounds of one gather each instead of
    materializing an (n_samples, C) matrix.

    :param cdf_rows: (R, C) row-wise inclusive CDFs, last column == total mass.
    :param row_idx:  (N,) int — which CDF row each sample draws from.
    :param u:        (N,) uniforms in [0, 1).
    :returns: (N,) int32 category indices; -1 where the row has zero mass
              (matching the reference's nan-pattern sentinel, s2.py:670-671).
    """
    n_cat = cdf_rows.shape[-1]
    total = cdf_rows[row_idx, n_cat - 1]
    target = u * total
    lo = jnp.zeros(row_idx.shape, dtype=jnp.int32)
    hi = jnp.full(row_idx.shape, n_cat - 1, dtype=jnp.int32)
    import math
    n_rounds = int(math.ceil(math.log2(max(n_cat, 2)))) + 1
    # Find smallest index i with cdf[i] > target
    for _ in range(n_rounds):
        mid = (lo + hi) // 2
        cmid = cdf_rows[row_idx, mid]
        go_right = cmid <= target
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    out = jnp.minimum(lo, n_cat - 1).astype(jnp.int32)
    return jnp.where(total > 0, out, -1)


def sample_inverse_cdf(key, inv_cdf: jnp.ndarray, n: int,
                       interpolate: bool = True):
    """Sample from a tabulated inverse CDF (grid of quantiles).

    Mirrors the grid-inverse-CDF idea the reference already uses for SPE gains
    (wfsim/core/pulse.py:211-227) and garfield timings (s2.py:411-457).
    """
    m = inv_cdf.shape[-1]
    u = jax.random.uniform(key, (n,)) * (m - 1)
    if not interpolate:
        return inv_cdf[jnp.round(u).astype(jnp.int32)]
    i0 = jnp.floor(u).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, m - 1)
    w = u - i0
    return inv_cdf[i0] * (1 - w) + inv_cdf[i1] * w


def truncated_exponential(key, scale, maximum, shape):
    """Exponential(scale) clipped at ``maximum`` (the reference clips rather
    than renormalizes, e.g. maximum_recombination_time at s1.py:229)."""
    return jnp.clip(jax.random.exponential(key, shape) * scale, 0.0, maximum)
