"""Microbenchmarks of TPU primitive variants that drive the round-5 kernel
surgery decisions: scalar vs block gathers, hierarchical CDF search vs
binary search, scatter-stats vs log-step segmented reductions, and the
jax.random.binomial/poisson samplers.

Each case is jitted as K chained applications (data-dependent, so XLA can't
CSE them) and timed by a blocking fetch of a tiny reduction — the only
reliable timing through the relay (CLAUDE.md).
"""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


def timeit(name, fn, *args, reps=3):
    out = fn(*args)           # compile
    _ = np.asarray(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    print(f'{name:48s} {best*1e3:9.2f} ms')
    return best


K = 8          # chained applications per timed call
N = 1 << 20    # query axis


def chain(body):
    """Run body K times with a data dependency between iterations."""
    def run(idx, *tabs):
        acc = jnp.zeros((), jnp.int32)
        for k in range(K):
            r = body((idx + acc) % idx.shape[0] if False else idx, k, *tabs)
            acc = acc + r.astype(jnp.int32).sum() % 7
        return acc
    return jax.jit(run)


def main():
    rng = np.random.default_rng(0)
    R, C = 512, 512
    tab = jnp.asarray(np.cumsum(rng.random((R, C)).astype(np.float32), 1))
    row = jnp.asarray(rng.integers(0, R, N).astype(np.int32))
    pos = jnp.asarray(rng.integers(0, C, N).astype(np.int32))
    u = jnp.asarray(rng.random(N).astype(np.float32))

    # --- gather variants ---
    timeit('scalar gather 2d (512,512)[row,pos] x8',
           chain(lambda i, k, t: t[row, (pos + k) % C]), pos, tab)
    flat = tab.reshape(-1)
    timeit('scalar gather flat 262k [i] x8',
           chain(lambda i, k, t: t[(row * C + pos + k) % (R * C)]), pos, flat)
    big = jnp.asarray(rng.random(4 * 1024 * 1024).astype(np.float32))
    timeit('scalar gather flat 4M [i] x8',
           chain(lambda i, k, t: t[(row * 997 + pos + k) % t.shape[0]]),
           pos, big)
    t16 = tab[:, :16]
    timeit('block gather (1,16) from (512,16) x8',
           chain(lambda i, k, t: t[(row + k) % R].sum(1)), pos, t16)
    t32 = tab.reshape(R * 16, 32)
    timeit('block gather (1,32) from (8192,32) x8',
           chain(lambda i, k, t: t[(row * 16 + k) % (R * 16)].sum(1)),
           pos, t32)
    e2 = jnp.asarray(rng.random((65536, 2)).astype(np.float32))
    timeit('block gather (1,2) from (65536,2) x8',
           chain(lambda i, k, t: t[(row + k) % 65536].sum(1)), pos, e2)
    e2b = jnp.asarray(rng.random((65536,)).astype(np.float32))
    timeit('scalar gather (65536,) x8',
           chain(lambda i, k, t: t[(row + k) % 65536]), pos, e2b)
    # dynamic_slice form of block gather
    fl = tab.reshape(-1)

    def ds_body(i, k, t):
        st = (row * 16 + k) % (R * C - 32)
        return jax.vmap(lambda s: jax.lax.dynamic_slice(t, (s,), (32,)))(st).sum(1)
    timeit('vmap dynamic_slice (32,) from 262k x8', chain(ds_body), pos, fl)

    # --- channel draw: binary search vs hierarchical block search ---
    def binsearch(i, k, t):
        target = u * t[row, C - 1]
        lo = jnp.zeros(N, jnp.int32)
        hi = jnp.full(N, C - 1, jnp.int32)
        for _ in range(10):
            mid = (lo + hi) // 2
            cmid = t[row, mid]
            go = cmid <= target
            lo = jnp.where(go, mid + 1, lo)
            hi = jnp.where(go, hi, mid)
        return jnp.minimum(lo, C - 1)
    timeit('channel draw: 10-round binary search x8',
           chain(binsearch), pos, tab)

    lvl0 = tab[:, 31::32]                    # (R, 16) superblock ends
    lvl1 = tab.reshape(R * 16, 32)           # (R*16, 32)

    def hier(i, k, t0, t1):
        g0 = t0[row]                         # (N,16)
        target = u * g0[:, -1]
        i0 = jnp.minimum(jnp.sum((g0 <= target[:, None]), 1), 15) \
            .astype(jnp.int32)
        g1 = t1[row * 16 + i0]               # (N,32)
        i1 = jnp.minimum(jnp.sum((g1 <= target[:, None]), 1), 31)
        return i0 * 32 + i1
    timeit('channel draw: hier (16)+(32) block search x8',
           chain(lambda i, k, t0, t1: hier(i, k, t0, t1)), pos, lvl0, lvl1)

    lvl0b = tab[:, 63::64]                   # (R, 8)
    lvl1b = tab.reshape(R * 8, 64)

    def hier2(i, k, t0, t1):
        g0 = t0[row]
        target = u * g0[:, -1]
        i0 = jnp.minimum(jnp.sum((g0 <= target[:, None]), 1), 7) \
            .astype(jnp.int32)
        g1 = t1[row * 8 + i0]
        i1 = jnp.minimum(jnp.sum((g1 <= target[:, None]), 1), 63)
        return i0 * 64 + i1
    timeit('channel draw: hier (8)+(64) block search x8',
           chain(hier2), pos, lvl0b, lvl1b)

    # --- segmented stats: scatter vs log-step ---
    seg = jnp.sort(row)                      # 512 contiguous segments

    def scat(i, k, t):
        x = (u + k).astype(jnp.float32)
        mn = jnp.full(R, jnp.inf).at[seg].min(x)
        mx = jnp.full(R, -jnp.inf).at[seg].max(x)
        return mn + mx
    timeit('segment min+max: scatter into 512 x8', chain(scat), pos, tab)

    def logstep(i, k, t):
        x = (u + k).astype(jnp.float32)
        mx = x
        mn = x
        s = seg
        d = 1
        while d < N:
            pad = jnp.full(d, -jnp.inf)
            mxs = jnp.concatenate([pad, mx[:-d]])
            mns = jnp.concatenate([-pad, mn[:-d]])
            same = jnp.concatenate([jnp.zeros(d, seg.dtype), s[:-d]]) == s
            mx = jnp.where(same, jnp.maximum(mx, mxs), mx)
            mn = jnp.where(same, jnp.minimum(mn, mns), mn)
            d *= 2
        # gather at segment ends
        ends = jnp.searchsorted(seg, jnp.arange(R, dtype=jnp.int32),
                                side='right') - 1
        return mx[ends] + mn[ends]
    timeit('segment min+max: log-step x8', chain(logstep), pos, tab)

    def segsum_scat(i, k, t):
        x = (u + k).astype(jnp.float32)
        return jnp.zeros(R).at[seg].add(x)
    timeit('segment sum: scatter-add into 512 x8', chain(segsum_scat),
           pos, tab)

    def segsum_cs(i, k, t):
        x = (u + k).astype(jnp.float32)
        cs = jnp.cumsum(x)
        ends = jnp.searchsorted(seg, jnp.arange(R + 1, dtype=jnp.int32))
        tot = jnp.concatenate([jnp.zeros(1), cs])
        return tot[ends[1:]] - tot[ends[:-1]]
    timeit('segment sum: cumsum+gather x8', chain(segsum_cs), pos, tab)

    # --- samplers ---
    key = jax.random.key(0, impl='rbg')
    tkey = jax.random.key(0, impl='threefry2x32')
    namp = jnp.asarray(rng.integers(1, 400, 256).astype(np.float32))
    p = jnp.asarray(rng.random(256).astype(np.float32) * 0.9)

    def binom(kk):
        out = jnp.zeros((), jnp.float32)
        for j in range(K):
            kj = jax.random.fold_in(kk, j)
            out = out + jax.random.binomial(kj, n=namp, p=p).sum()
        return out
    timeit('binomial (256,) rbg x8', jax.jit(binom), key)
    timeit('binomial (256,) threefry x8', jax.jit(binom), tkey)

    lam = jnp.asarray((rng.random(65536) * 30).astype(np.float32))

    def poi(kk):
        out = jnp.zeros((), jnp.int32)
        for j in range(K):
            kj = jax.random.fold_in(kk, j)
            out = out + jax.random.poisson(kj, lam).sum()
        return out
    timeit('poisson (65536,) threefry x8', jax.jit(poi), tkey)

    def unif(kk):
        out = jnp.zeros((), jnp.float32)
        for j in range(K):
            kj = jax.random.fold_in(kk, j)
            out = out + jax.random.uniform(kj, (N,)).sum()
        return out
    timeit('uniform (1M,) rbg x8', jax.jit(unif), key)
    timeit('uniform (1M,) threefry x8', jax.jit(unif), tkey)

    def norm(kk):
        out = jnp.zeros((), jnp.float32)
        for j in range(K):
            kj = jax.random.fold_in(kk, j)
            out = out + jax.random.normal(kj, (N,)).sum()
        return out
    timeit('normal (1M,) rbg x8', jax.jit(norm), key)

    # marks+cumsum segment ids (for reference)
    cnts = jnp.asarray(np.diff(np.searchsorted(np.sort(np.asarray(seg)),
                                               np.arange(R + 1))).astype(np.int32))

    def marks(i, k, t):
        cs = jnp.cumsum(cnts)
        m = jnp.zeros(N, jnp.int32).at[cs].add(1, mode='drop')
        return jnp.cumsum(m) + k
    timeit('marks+cumsum seg ids 1M x8', chain(marks), pos, tab)


if __name__ == '__main__':
    main()
