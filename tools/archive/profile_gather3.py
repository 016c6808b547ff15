"""Gather strategy microbench for the extension context fetch.

N candidates each need nw2=8 consecutive uint32 words of packed genome
(plus an N-flag). Variants:
  A  row-gather [N,16] from materialised gview [G,16]   (round-2 design)
  B  row-gather [N,8]  from gview-pack-only [G,8]
  C  8 elementwise gathers [N] from flat gpack [G/16]   (no gview at all)
  D  row-gather [N,4] int64 pairs from [G,4] int64
  E  row-gather [N,128] from [G,128]  (width scaling check)
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

G = 4_600_000
NW = 287_500 + 8          # packed words
N = 524_288               # candidates (B=32K x NC=16)
REP = 10

rng = np.random.default_rng(0)
gpack = jnp.asarray(rng.integers(0, 2**32, NW, dtype=np.uint64)
                    .astype(np.uint32))
idx_pos = jnp.asarray(rng.integers(0, G - 200, N).astype(np.int32))
widx = idx_pos >> 4


def timeit(name, fn, *args):
    jax.block_until_ready(fn(*args))
    t0 = time.time()
    outs = [fn(*args) for _ in range(REP)]
    jax.block_until_ready(outs[-1])
    dt = (time.time() - t0) / REP
    print(f"{name:44s} {dt*1000:8.2f} ms", flush=True)


# A: [G,16] gview
gview16 = jnp.stack([jnp.roll(gpack, -j) for j in range(16)], axis=1)
@jax.jit
def rowA(w):
    return gview16[w].sum(dtype=jnp.uint32)

# B: [G,8]
gview8 = gview16[:, :8]
@jax.jit
def rowB(w):
    return gview8[w].sum(dtype=jnp.uint32)

# C: elementwise from flat
@jax.jit
def elemC(w):
    acc = jnp.zeros_like(w, dtype=jnp.uint32)
    for j in range(8):
        acc = acc + gpack[jnp.clip(w + j, 0, NW - 1)]
    return acc.sum(dtype=jnp.uint32)

# D: float32-bitcast rows (layout/dtype effect check)
gvf = jax.lax.bitcast_convert_type(gview8, jnp.float32)
@jax.jit
def rowD(w):
    return jax.lax.bitcast_convert_type(gvf[w], jnp.uint32).sum(
        dtype=jnp.uint32)

# E: wide rows (fewer indices, same bytes as A at N/8)
gview128 = jnp.tile(gview16, (1, 8))   # [G,128]
@jax.jit
def rowE(w):
    return gview128[w[:N // 8]].sum(dtype=jnp.uint32)

# F: take_along_axis formulation of B
@jax.jit
def rowF(w):
    return jnp.take(gview8, w, axis=0).sum(dtype=jnp.uint32)

print(f"devices: {jax.devices()} N={N}", flush=True)
timeit("A row[N,16] from [G,16] (294MB tbl)", rowA, widx)
timeit("B row[N,8]  from [G,8]  (147MB tbl)", rowB, widx)
timeit("C 8x elem[N] from gpack (1.1MB tbl)", elemC, widx)
timeit("D row[N,8] f32-bitcast", rowD, widx)
timeit("E row[N/8,128] wide", rowE, widx)
timeit("F take(gview8)", rowF, widx)
