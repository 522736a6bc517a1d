"""Round-5 microbench #6: phase-histogram + banded-matmul layout variants
at gather_digitize shape (R=B*C=31616 rows, dt=10, T=1024, 500k photons).

v1: 1-D flat scatter -> reshape (R,dt,T) [retile copy] -> 3-D conv (r4 form)
v2: 2-D scatter into (R*dt, Tp) -> per-segment reshape (R, dt*M) -> dot
v3: 2-D scatter -> free leading-split (R,dt,M) -> 2-contracting-dim dot
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
    print(f'{name:56s} {best*1e3:9.2f} ms')
    return best


R, DT, T, L = 31616, 10, 1024, 22
N = 1 << 19
S = 128
M = S + L - 1


def band_mat(templates):
    u = jnp.arange(S, dtype=jnp.int32)[None, :]
    m = jnp.arange(M, dtype=jnp.int32)[:, None]
    k = u - m + (L - 1)
    return jnp.where((k >= 0) & (k < L),
                     templates[:, jnp.clip(k, 0, L - 1)], 0.0)


def main():
    rng = np.random.default_rng(0)
    templates = jnp.asarray(rng.random((DT, L)).astype(np.float32) * 1e-2)
    band = band_mat(templates).reshape(DT * M, S)
    band3 = band_mat(templates)                      # (DT, M, S)
    ch = jnp.asarray(rng.integers(0, R, N).astype(np.int32))
    s = jnp.asarray(rng.integers(0, T, N).astype(np.int32))
    r = jnp.asarray(rng.integers(0, DT, N).astype(np.int32))
    g = jnp.asarray(rng.random(N).astype(np.float32))

    def v1(x):
        acc = jnp.zeros((), jnp.float32)
        for k in range(2):
            flat_idx = (ch * DT + r) * T + s
            H = jnp.zeros((R * DT * T,), jnp.float32).at[flat_idx].add(g + k + x)
            H = H.reshape(R, DT, T)
            Hp = jnp.pad(H, ((0, 0), (0, 0), (L - 1, 0)))
            outs = []
            for j in range(T // S):
                Pj = jax.lax.dynamic_slice(Hp, (0, 0, j * S), (R, DT, M))
                outs.append(jax.lax.dot_general(
                    Pj.reshape(R, DT * M), band, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST))
            W = jnp.concatenate(outs, axis=1)
            acc = acc + W[::977, ::97].sum()
        return acc
    timeit('v1: flat scatter + retile + 3-D conv x2', jax.jit(v1),
           jnp.float32(0))

    def v2(x):
        acc = jnp.zeros((), jnp.float32)
        for k in range(2):
            rows = ch * DT + r
            H = jnp.zeros((R * DT, T + L - 1), jnp.float32
                          ).at[rows, s + (L - 1)].add(g + k + x)
            outs = []
            for j in range(T // S):
                Pj = jax.lax.dynamic_slice(H, (0, j * S), (R * DT, M))
                outs.append(jax.lax.dot_general(
                    Pj.reshape(R, DT * M), band, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST))
            W = jnp.concatenate(outs, axis=1)
            acc = acc + W[::977, ::97].sum()
        return acc
    timeit('v2: 2-D scatter + per-seg reshape dot x2', jax.jit(v2),
           jnp.float32(0))

    def v3(x):
        acc = jnp.zeros((), jnp.float32)
        for k in range(2):
            rows = ch * DT + r
            H = jnp.zeros((R * DT, T + L - 1), jnp.float32
                          ).at[rows, s + (L - 1)].add(g + k + x)
            outs = []
            for j in range(T // S):
                Pj = jax.lax.dynamic_slice(H, (0, j * S), (R * DT, M))
                Pj3 = Pj.reshape(R, DT, M)
                outs.append(jax.lax.dot_general(
                    Pj3, band3, (((1, 2), (0, 1)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST))
            W = jnp.concatenate(outs, axis=1)
            acc = acc + W[::977, ::97].sum()
        return acc
    timeit('v3: 2-D scatter + 2-contract dot x2', jax.jit(v3),
           jnp.float32(0))

    # cross-check v1 vs v2 vs v3 numerics
    a = np.asarray(jax.jit(v1)(jnp.float32(1)))
    b = np.asarray(jax.jit(v2)(jnp.float32(1)))
    c = np.asarray(jax.jit(v3)(jnp.float32(1)))
    print('agree v1/v2/v3:', np.allclose(a, b, rtol=1e-5),
          np.allclose(a, c, rtol=1e-5))


if __name__ == '__main__':
    main()
