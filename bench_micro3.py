"""Round-5 microbench #3: the pack-kernel record-sample read rebuilt as
two aligned 128-wide row gathers + a log-step barrel shift, vs the
arbitrary-start slice gather (110,) — and row-gather width scaling."""
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
R = 131072
T = 14_000_000
SPR = 110


def main():
    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.integers(-100, 100, T).astype(np.int16))
    starts = jnp.asarray(rng.integers(0, T - 256, R).astype(np.int32))
    nb = T // 128
    f2 = flat[:nb * 128].reshape(nb, 128)

    def chain(body):
        def run(s):
            acc = jnp.zeros((), jnp.int32)
            for k in range(K):
                r = body((s + acc + k) % (T - 256))
                acc = (acc + r.astype(jnp.int32).sum()) % 7
            return acc
        return jax.jit(run)

    def width_case(w):
        fw = flat[:(T // w) * w].reshape(-1, w)

        def body(s):
            return fw[(s // w)].astype(jnp.int32).sum(1)
        return body
    for w in (32, 64, 128, 256):
        timeit(f'row gather width {w} x8 (131k rows)', chain(width_case(w)),
               starts)

    def barrel(s):
        b = s // 128
        off = s % 128
        lo = f2[b]
        hi = f2[jnp.minimum(b + 1, nb - 1)]
        x = jnp.concatenate([lo, hi], axis=1)            # (R, 256) i16
        for k in (64, 32, 16, 8, 4, 2, 1):
            bit = (off & k) > 0
            sh = jnp.pad(x[:, k:], ((0, 0), (0, k)))
            x = jnp.where(bit[:, None], sh, x)
        return x[:, :SPR].astype(jnp.int32).sum(1)
    timeit('2 row gathers + barrel shift -> (110,) x8', chain(barrel),
           starts)

    def slice110(s):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,))
        out = jax.lax.gather(flat, s[:, None], dn, slice_sizes=(SPR,),
                             mode=jax.lax.GatherScatterMode.CLIP)
        return out.astype(jnp.int32).sum(1)
    timeit('lax.gather (110,) slices x8 (control)', chain(slice110), starts)


if __name__ == '__main__':
    main()
