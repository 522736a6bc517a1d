"""Round-5 microbench #2: pack-kernel primitive variants at bench shapes.

- 110-wide record-sample reads: vmap dynamic_slice vs explicit lax.gather
  vs two aligned row-block gathers + select
- the 110-wide stable row sort (value compaction)
- expand_rows (diff-scatter + cumsum) vs scalar gather broadcast
- hier search at the luminescence shape (256 rows x 4883)
"""
import time
import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    _ = np.asarray(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    print(f'{name:52s} {best*1e3:9.2f} ms')
    return best


K = 8
R = 131072          # records per pack call
T = 14_000_000      # flat grid samples
SPR = 110


def main():
    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.integers(-100, 100, T).astype(np.int16))
    starts = jnp.asarray(rng.integers(0, T - 128, R).astype(np.int32))

    def chain(body):
        def run(s, f):
            acc = jnp.zeros((), jnp.int32)
            for k in range(K):
                r = body((s + acc + k) % (T - 128), f)
                acc = (acc + r.astype(jnp.int32).sum()) % 7
            return acc
        return jax.jit(run)

    def vds(s, f):
        return jax.vmap(
            lambda st: jax.lax.dynamic_slice(f, (st,), (SPR,)))(s).sum(1)
    timeit('rec samples: vmap dynamic_slice (110,) x8', chain(vds),
           starts, flat)

    def lgather(s, f):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(),
            start_index_map=(0,))
        out = jax.lax.gather(f, s[:, None], dn, slice_sizes=(SPR,),
                             mode=jax.lax.GatherScatterMode.CLIP)
        return out.sum(1)
    timeit('rec samples: lax.gather (110,) slices x8', chain(lgather),
           starts, flat)

    def twoblock(s, f):
        # aligned 128-wide row gathers from the reshaped (T//128, 128) view
        f2 = f[: (T // 128) * 128].reshape(-1, 128)
        b = s // 128
        off = s % 128
        lo = f2[b]
        hi = f2[jnp.minimum(b + 1, f2.shape[0] - 1)]
        both = jnp.concatenate([lo, hi], axis=1)          # (R, 256)
        idx = off[:, None] + jnp.arange(SPR, dtype=jnp.int32)[None, :]
        out = jnp.take_along_axis(both, idx, axis=1)
        return out.sum(1)
    timeit('rec samples: 2 aligned row-blocks + take_along x8',
           chain(twoblock), starts, flat)

    # row sort (value compaction) at pack shape
    dm = jnp.asarray(rng.random((R, SPR)) < 0.3)
    rws = jnp.asarray(rng.integers(-100, 100, (R, SPR)).astype(np.int16))

    def rowsort(s, f):
        _, pv = jax.lax.sort((~dm, rws + (s[:1] % 3).astype(jnp.int16)),
                             dimension=1, is_stable=True, num_keys=1)
        return pv.astype(jnp.int32).sum()
    t = timeit('row sort (131k,110) stable x1', jax.jit(
        lambda s, f: rowsort(s, f)), starts, flat)

    # expand_rows vs gather broadcast at 1M photons / 65k electrons
    N = 1 << 20
    E = 65536
    vals = jnp.asarray(rng.integers(0, 1 << 20, E).astype(np.int32))
    cnts = np.zeros(E, np.int64)
    ix = rng.integers(0, E, N)
    np.add.at(cnts, ix, 1)
    edges = jnp.asarray(np.concatenate([[0], np.cumsum(cnts)]).astype(np.int32))
    segid = jnp.asarray(np.repeat(np.arange(E), cnts).astype(np.int32))

    def expand(s, f):
        prev = jnp.concatenate([jnp.zeros(1, jnp.int32), vals[:-1]])
        d = jnp.zeros(N, jnp.int32).at[
            jnp.clip(edges[:-1], 0, N)].add(vals - prev, mode='drop')
        acc = jnp.zeros((), jnp.int32)
        for k in range(K):
            acc = acc + jnp.cumsum(d + (s[:1] - s[:1])[0] * 0).sum() % 7 + k
        return acc
    timeit('expand_rows: 65k diff-scatter + 1M cumsum x8', jax.jit(expand),
           starts, flat)

    def gb(s, f):
        acc = jnp.zeros((), jnp.int32)
        for k in range(K):
            acc = acc + vals[(segid + acc % 2)].sum() % 7 + k
        return acc
    timeit('gather broadcast vals[segid] 1M x8', jax.jit(gb), starts, flat)

    # hier search at luminescence shape (I=256 rows, C=4883), 262k queries
    I, C, Q = 256, 4883, 262144
    tab = jnp.asarray(np.cumsum(rng.random((I, C)).astype(np.float32), 1))
    row = jnp.asarray(rng.integers(0, I, Q).astype(np.int32))
    qv = jnp.asarray((rng.random(Q) * C).astype(np.float32))
    import wfsim_tpu  # noqa  (compile cache setup)
    from wfsim_tpu.ops.randsample import search_sorted_rows

    def hier(s, f):
        acc = jnp.zeros((), jnp.int32)
        for k in range(K):
            acc = acc + search_sorted_rows(tab, row, qv + acc.astype(
                jnp.float32) * 0 + k, side='left').sum() % 7
        return acc
    timeit('hier search (256x4883) 262k queries x8', jax.jit(hier),
           starts, flat)

    # segmented log-step min/max at 1M with 65k segments (photon_time_stats)
    tvals = jnp.asarray(rng.integers(0, 1 << 20, N).astype(np.int32))
    from wfsim_tpu.ops.segment import segment_min_max

    def smm(s, f):
        acc = jnp.zeros((), jnp.int32)
        for k in range(K):
            mn, mx = segment_min_max(tvals + k, segid, edges, E)
            acc = acc + mn.sum() % 5 + mx.sum() % 7
        return acc
    timeit('segment_min_max log-step 1M/65k segs x8', jax.jit(smm),
           starts, flat)


if __name__ == '__main__':
    main()
