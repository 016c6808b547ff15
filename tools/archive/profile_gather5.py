"""Confirm the gather slow-path trigger: fusion with consumers/reductions.
If a pure gather runs at ~0.1 ns/idx but gather+scalar-reduce runs at
~10 ns/idx, an optimization_barrier after the gather should recover the
fast path for the real extension pipeline."""
import sys, os, time
import numpy as np
import jax
import jax.numpy as jnp

NW = 287_508
N = 524_288
REP = 10
rng = np.random.default_rng(0)
gpack = jnp.asarray(rng.integers(0, 2**32, NW, dtype=np.uint64)
                    .astype(np.uint32))
gview16 = jnp.asarray(np.stack(
    [np.roll(np.asarray(gpack), -j) for j in range(16)], axis=1))
widx = jnp.asarray(rng.integers(0, NW - 20, N).astype(np.int32))
rpack = jnp.asarray(rng.integers(0, 2**32, (N, 7), dtype=np.uint64)
                    .astype(np.uint32))


def timeit(name, fn, *args):
    jax.block_until_ready(fn(*args))
    t0 = time.time()
    outs = [fn(*args) for _ in range(REP)]
    jax.block_until_ready(outs[-1])
    dt = (time.time() - t0) / REP
    print(f"{name:52s} {dt*1000:8.2f} ms", flush=True)


@jax.jit
def scalar_sum_fused(w):
    return gview16[w].sum(dtype=jnp.uint32)


@jax.jit
def scalar_sum_barrier(w):
    rows = jax.lax.optimization_barrier(gview16[w])
    return rows.sum(dtype=jnp.uint32)


@jax.jit
def extend_fused(w, rp):
    rows = gview16[w]                              # [N, 16]
    sh = (2 * (w & 15)).astype(jnp.uint32)[:, None]
    lo = rows[:, :7] >> sh
    hi = jnp.where(sh == 0, jnp.uint32(0), rows[:, 1:8] << (32 - sh))
    ga = lo | hi
    x = ga ^ rp
    mism = (x | (x >> 1)) & jnp.uint32(0x55555555)
    return jnp.sum(jax.lax.population_count(mism), axis=-1,
                   dtype=jnp.int32)


@jax.jit
def extend_barrier(w, rp):
    rows = jax.lax.optimization_barrier(gview16[w])
    sh = (2 * (w & 15)).astype(jnp.uint32)[:, None]
    lo = rows[:, :7] >> sh
    hi = jnp.where(sh == 0, jnp.uint32(0), rows[:, 1:8] << (32 - sh))
    ga = lo | hi
    x = ga ^ rp
    mism = (x | (x >> 1)) & jnp.uint32(0x55555555)
    return jnp.sum(jax.lax.population_count(mism), axis=-1,
                   dtype=jnp.int32)


@jax.jit
def eight_elem_barrier(w):
    cols = []
    for j in range(8):
        cols.append(gpack[jnp.clip(w + j, 0, NW - 1)])
    g = jax.lax.optimization_barrier(jnp.stack(cols, axis=1))
    return g.sum(dtype=jnp.uint32)


@jax.jit
def pure_gather(w):
    return gview16[w]


print(f"devices: {jax.devices()}", flush=True)
timeit("pure row gather [N,16] (no reduce)", pure_gather, widx)
timeit("row gather + scalar sum FUSED", scalar_sum_fused, widx)
timeit("row gather + barrier + scalar sum", scalar_sum_barrier, widx)
timeit("gather+shift+xor+popcount FUSED", extend_fused, widx, rpack)
timeit("gather+BARRIER+shift+xor+popcount", extend_barrier, widx, rpack)
timeit("8x elem gathers + barrier + sum", eight_elem_barrier, widx)
