"""Microbenchmark: XLA TPU gather forms — elementwise vs row vs dyn-slice."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

Gw = 300_000
NIDX = 786_432          # 8192 reads x 96 candidates
ROW = 16

rng = np.random.default_rng(0)
gpack = jnp.asarray(rng.integers(0, 2**32, Gw, dtype=np.uint32))
g2d = jnp.asarray(rng.integers(0, 2**32, (Gw, ROW), dtype=np.uint32))
idx = jnp.asarray(rng.integers(0, Gw - ROW, NIDX, dtype=np.int32))
idx_el = jnp.asarray(rng.integers(0, Gw, NIDX * ROW, dtype=np.int32))
sortin = jnp.asarray(rng.integers(0, 2**31, (8192, 288), dtype=np.int32))


def timeit(name, fn, *args, n=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / n
    print(f"{name:36s} {dt*1000:8.2f} ms")
    return out


@jax.jit
def elementwise(i):
    return gpack[i]                       # NIDX*ROW individual indices


@jax.jit
def row_take(i):
    return g2d[i]                          # NIDX row gathers of ROW words


@jax.jit
def dyn_slice(i):
    return jax.vmap(lambda j: jax.lax.dynamic_slice(gpack, (j,), (ROW,)))(i)


@jax.jit
def strided_el(i):
    # elementwise but contiguous pattern: i[:,None] + arange(ROW)
    return gpack[i[:, None] + jnp.arange(ROW, dtype=jnp.int32)]


@jax.jit
def sort288(x):
    return jnp.sort(x, axis=1)


@jax.jit
def topk16(x):
    return jax.lax.top_k(-x, 16)


timeit("elementwise 12.6M idx", elementwise, idx_el)
timeit("row take [N,16] 786K idx", row_take, idx)
timeit("vmap dynamic_slice 786K idx", dyn_slice, idx)
timeit("strided elementwise 786Kx16", strided_el, idx)
timeit("sort [8192,288] int32", sort288, sortin)
timeit("top_k 16 of [8192,288]", topk16, sortin)
