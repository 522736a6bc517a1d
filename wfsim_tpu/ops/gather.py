"""Fast contiguous-span gathers for TPU.

On this TPU backend the ONLY fast gather form is a row-indexed block
gather from a 2-D table (``tab[idx]`` — ~0.3 ms per 131k rows at any width
up to 256); arbitrary-start 1-D slice gathers (``vmap(dynamic_slice)`` or
``lax.gather`` with a >1 slice size) element-serialize at ~10 ns/element
(~50x slower at record-pack shapes — measured, bench_micro3.py).

:func:`gather_spans` reads ``width`` consecutive elements starting at an
arbitrary flat offset per query by gathering the covering 128-aligned
blocks as table rows and aligning them with a log-step barrel shift
(7 static-shift select passes, which XLA streams on the VPU).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ['gather_spans']


def gather_spans(flat: jnp.ndarray, starts: jnp.ndarray, width: int):
    """``out[i, k] == flat[starts[i] + k]`` for ``k < width``.

    Reads past the end of ``flat`` return the pad value 0 (callers mask).
    ``width`` is static.  Cost: ceil((width+127)/128)+1 row gathers per
    query plus 7 select passes over the (N, blocks*128) working set.
    """
    nblk = (width + 127) // 128 + 1
    pad = nblk * 128 + 128
    flat = jnp.concatenate(
        [flat, jnp.zeros(pad, flat.dtype)]) if flat.ndim == 1 else flat
    nb = flat.shape[0] // 128
    f2 = flat[:nb * 128].reshape(nb, 128)
    b0 = jnp.clip(starts // 128, 0, nb - 1)
    off = starts - b0 * 128
    parts = [f2[jnp.minimum(b0 + j, nb - 1)] for j in range(nblk)]
    x = jnp.concatenate(parts, axis=1)
    for sh in (64, 32, 16, 8, 4, 2, 1):
        bit = (off & sh) > 0
        x = jnp.where(bit[:, None], jnp.pad(x[:, sh:], ((0, 0), (0, sh))), x)
    return x[:, :width]
