"""Map XLA's TPU gather fast-path threshold vs table size + conditions.

Observed: 524K-index gather from a 1MB table = 0.1 ns/idx, from 147-294MB
tables = ~10-15 ns/idx. Where is the cliff, and what breaks the fast path
(index arithmetic, fusion with other gathers, row width)?"""
import sys, os, time
import numpy as np
import jax
import jax.numpy as jnp

N = 524_288
rng = np.random.default_rng(0)


def timeit(name, fn, *args, rep=10):
    jax.block_until_ready(fn(*args))
    t0 = time.time()
    outs = [fn(*args) for _ in range(rep)]
    jax.block_until_ready(outs[-1])
    dt = (time.time() - t0) / rep
    print(f"{name:46s} {dt*1000:8.2f} ms  ({dt/N*1e9:6.2f} ns/idx)",
          flush=True)


print(f"devices: {jax.devices()}", flush=True)

for mb in (1, 4, 8, 16, 24, 32, 64, 128):
    T = mb * 262_144
    tbl = jnp.asarray(rng.integers(0, 2**31, T).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, T, N).astype(np.int32))
    f = jax.jit(lambda t, i: t[i])
    timeit(f"plain gather  tbl={mb:4d}MB", f, tbl, idx)
    del tbl, idx

# conditions at 4MB
T = 4 * 262_144
tbl = jnp.asarray(rng.integers(0, 2**31, T).astype(np.int32))
tblu = jnp.asarray(rng.integers(0, 2**32, T, dtype=np.uint64)
                   .astype(np.uint32))
idx = jnp.asarray(rng.integers(0, T - 64, N).astype(np.int32))

timeit("uint32 table 4MB", jax.jit(lambda t, i: t[i]), tblu, idx)
timeit("computed idx (clip(i+7))",
       jax.jit(lambda t, i: t[jnp.clip(i + 7, 0, T - 1)]), tbl, idx)


@jax.jit
def eight(t, i):
    acc = jnp.zeros_like(i)
    for j in range(8):
        acc = acc + t[jnp.clip(i + j, 0, T - 1)]
    return acc


timeit("8 chained gathers+adds (fused)", eight, tbl, idx)


@jax.jit
def eight_stacked(t, i):
    # one gather of [8, N] indices instead of 8 fused gathers
    ii = jnp.clip(i[None, :] + jnp.arange(8, dtype=jnp.int32)[:, None],
                  0, T - 1)
    return t[ii].sum(axis=0)


timeit("one gather of [8,N] idx (+sum)", eight_stacked, tbl, idx)

tbl2 = tbl.reshape(-1, 2)
idx2 = jnp.asarray(rng.integers(0, T // 2, N).astype(np.int32))
timeit("row gather [N,2] from [T/2,2]",
       jax.jit(lambda t, i: t[i].sum(axis=1)), tbl2, idx2)

tbl16 = jnp.asarray(rng.integers(0, 2**31, (T // 16, 16)).astype(np.int32))
idx16 = jnp.asarray(rng.integers(0, T // 16, N).astype(np.int32))
timeit("row gather [N,16] from [T/16,16]",
       jax.jit(lambda t, i: t[i].sum(axis=1)), tbl16, idx16)

# 18MB (SA-size) row widths
T18 = 18 * 262_144
tbl18 = jnp.asarray(rng.integers(0, 2**31, T18).astype(np.int32))
idx18 = jnp.asarray(rng.integers(0, T18, N).astype(np.int32))
timeit("plain gather tbl=18MB", jax.jit(lambda t, i: t[i]), tbl18, idx18)
# same data as 2 uint16 planes (9MB each)
lo = jnp.asarray(rng.integers(0, 2**16, T18).astype(np.uint16))
hi = jnp.asarray(rng.integers(0, 2**16, T18).astype(np.uint16))


@jax.jit
def planes(lo_t, hi_t, i):
    return (lo_t[i].astype(jnp.int32)
            | (hi_t[i].astype(jnp.int32) << 16))


timeit("2x uint16 plane gathers (9MB each)", planes, lo, hi, idx18)
