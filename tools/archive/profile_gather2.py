"""Row-gather scaling: width, index count, chained (dispatch-free) cost."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

Gw = 3_000_000
rng = np.random.default_rng(0)


def timeit(name, fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / n
    print(f"{name:42s} {dt*1000:8.2f} ms")
    return out


for width in (8, 16, 32, 64):
    g2d = jnp.asarray(rng.integers(0, 2**32, (Gw, width), dtype=np.uint32))
    for nidx in (65_536, 131_072, 786_432):
        idx = jnp.asarray(rng.integers(0, Gw, nidx, dtype=np.int32))

        @jax.jit
        def take(i, g=g2d):
            return g[i]

        timeit(f"row take w={width} n={nidx//1024}K", take, idx)

# chained: 8 dependent gathers in one executable => amortized dispatch
g2d = jnp.asarray(rng.integers(0, 2**32, (Gw, 16), dtype=np.uint32))
idx = jnp.asarray(rng.integers(0, Gw, 131_072, dtype=np.int32))


@jax.jit
def chained(i):
    acc = jnp.zeros((131_072, 16), jnp.uint32)
    for s in range(8):
        acc = acc + g2d[(i + s) % Gw]
    return acc


timeit("8x chained row take w=16 n=128K", chained, idx)

# elementwise small-count baselines
g1d = jnp.asarray(rng.integers(0, 2**32, Gw, dtype=np.uint32))
for nidx in (131_072, 262_144):
    idx = jnp.asarray(rng.integers(0, Gw, nidx, dtype=np.int32))

    @jax.jit
    def el(i):
        return g1d[i]

    timeit(f"elementwise n={nidx//1024}K", el, idx)

# int64 sort [8192,16] (hit ordering) and masked argmin iterations
x = jnp.asarray(rng.integers(0, 2**60, (8192, 16), dtype=np.int64))


@jax.jit
def sort16(v):
    return jnp.sort(v, axis=1)


@jax.jit
def argmin5(v):
    hits = []
    w = v
    for _ in range(5):
        a = jnp.argmin(w, axis=1)
        hits.append(jnp.take_along_axis(w, a[:, None], axis=1))
        w = w.at[jnp.arange(8192), a].set(jnp.iinfo(jnp.int64).max)
    return jnp.concatenate(hits, axis=1)


timeit("sort [8192,16] int64", sort16, x)
timeit("5x masked argmin [8192,16]", argmin5, x)
