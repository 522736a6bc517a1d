"""Round-5 microbench #4: value-stream compaction variants at pack shape
(131k records x 110 samples, ~30% masked -> ~4.3M values), and big-scatter
scaling for the waveform histogram."""
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
    print(f'{name:56s} {best*1e3:9.2f} ms')
    return best


R, SPR = 131072, 110
V = 1 << 22


def main():
    rng = np.random.default_rng(0)
    dm = jnp.asarray(rng.random((R, SPR)) < 0.3)
    rws = jnp.asarray(rng.integers(-100, 100, (R, SPR)).astype(np.int16))

    def old_form(k, dm, rws):
        nnz_r = dm.sum(axis=1).astype(jnp.int32)
        csum_r = jnp.cumsum(nnz_r)
        marks = jnp.zeros(V, jnp.int32).at[csum_r].add(1, mode='drop')
        row_of = jnp.clip(jnp.cumsum(marks), 0, R - 1)
        vq = jnp.arange(V, dtype=jnp.int32)
        valid_v = vq < csum_r[-1]
        off = csum_r - nnz_r
        bnd = jnp.zeros(V, jnp.int32).at[
            jnp.where(nnz_r > 0, off, V)].max(off, mode='drop')
        off_v = jax.lax.cummax(bnd)
        k_in_row = vq - off_v
        _, packed_vals = jax.lax.sort((~dm, rws + k), dimension=1,
                                      is_stable=True, num_keys=1)
        values = jnp.where(valid_v,
                           packed_vals.reshape(-1)[
                               row_of * SPR + jnp.clip(k_in_row, 0, SPR - 1)],
                           0).astype(jnp.int16)
        return values

    def run_old(x, dm, rws):
        acc = jnp.zeros((), jnp.int32)
        for k in range(4):
            acc = (acc + old_form(jnp.int16(k) + x, dm, rws).astype(jnp.int32).sum()) % 7
        return acc
    timeit('values: row-sort + flat gather x4', jax.jit(run_old),
           jnp.int16(0), dm, rws)

    def new_form(k, dm, rws):
        nnz_r = dm.sum(axis=1).astype(jnp.int32)
        csum_r = jnp.cumsum(nnz_r)
        off = csum_r - nnz_r
        popc = jnp.cumsum(dm.astype(jnp.int32), axis=1)
        opos = off[:, None] + popc - 1
        tgt = jnp.where(dm, opos, V)
        values = jnp.zeros(V, jnp.int16).at[tgt.reshape(-1)].set(
            (rws + k).reshape(-1), mode='drop')
        return values

    def run_new(x, dm, rws):
        acc = jnp.zeros((), jnp.int32)
        for k in range(4):
            acc = (acc + new_form(jnp.int16(k) + x, dm, rws).astype(jnp.int32).sum()) % 7
        return acc
    timeit('values: rowwise-cumsum + 14.4M scatter-set x4', jax.jit(run_new),
           jnp.int16(0), dm, rws)

    # waveform-histogram-style scatter-add scaling
    N = 1 << 22
    OUT = 1 << 27
    g = jnp.asarray(rng.random(N).astype(np.float32))
    ridx = jnp.asarray(rng.integers(0, OUT, N).astype(np.int32))
    sidx = jnp.sort(ridx)

    def scat(ix):
        def run(x):
            acc = jnp.zeros((), jnp.float32)
            for k in range(4):
                h = jnp.zeros(OUT, jnp.float32).at[ix + k].add(g, mode='drop')
                acc = acc + h[::65536].sum()
            return acc
        return jax.jit(run)
    timeit('scatter-add 4M random -> 128M x4', scat(ridx), jnp.int32(0))
    timeit('scatter-add 4M sorted -> 128M x4', scat(sidx), jnp.int32(0))


if __name__ == '__main__':
    main()
