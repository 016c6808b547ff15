"""Decisive grid: pure-gather cost vs (rows, width, dtype).
Hypothesis: multi-word row gathers hit a fast path only when the table has
<= 64K rows (16-bit row id); width-1 gathers are always fast."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

N = 524_288
rng = np.random.default_rng(0)


def timeit(name, fn, *args):
    jax.block_until_ready(fn(*args))
    t0 = time.time()
    outs = [fn(*args) for _ in range(8)]
    jax.block_until_ready(outs[-1])
    dt = (time.time() - t0) / 8
    print(f"{name:44s} {dt*1000:8.2f} ms", flush=True)


print(f"devices: {jax.devices()}", flush=True)
g = jax.jit(lambda t, i: t[i])

for rows in (65_536, 65_537, 131_072, 287_508, 1_048_576):
    for width in (1, 8, 16):
        tbl = jnp.asarray(rng.integers(0, 2**31, (rows, width))
                          .astype(np.int32))
        if width == 1:
            tbl = tbl[:, 0]
        idx = jnp.asarray(rng.integers(0, rows, N).astype(np.int32))
        timeit(f"int32  rows={rows:8d} w={width:2d}", g, tbl, idx)
        del tbl, idx

tbl = jnp.asarray(rng.integers(0, 2**32, (287_508, 16), dtype=np.uint64)
                  .astype(np.uint32))
idx = jnp.asarray(rng.integers(0, 287_508, N).astype(np.int32))
timeit("uint32 rows=  287508 w=16", g, tbl, idx)
