"""TRUSTWORTHY gather cost model (axon block_until_ready is a no-op; only
data fetches sync). Measures ns/index vs row width and index count."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

rng = np.random.default_rng(0)
M = 4_600_000


def timeit(name, fn, batches, per_call_idx):
    float(jnp.sum(fn(batches[0])))          # compile + sync
    best = None
    for _ in range(3):
        t0 = time.time()
        outs = [fn(b) for b in batches]
        tot = sum(jnp.sum(o) for o in outs)
        float(tot)
        dt = (time.time() - t0) / len(batches)
    # fixed per-call overhead estimate: subtract via two sizes elsewhere
        if best is None or dt < best:
            best = dt
    print(f"{name:46s} {best*1000:8.2f} ms/call "
          f"({best/per_call_idx*1e9:6.2f} ns/idx)", flush=True)


def batches_of(n, n_uniq=8, lim=M):
    return [jnp.asarray(rng.integers(0, lim, n).astype(np.int32))
            for _ in range(n_uniq)]


print(f"devices: {jax.devices()}", flush=True)

for width in (1, 4, 17):
    tbl = jnp.asarray(
        rng.integers(0, 2**31, (M, width), dtype=np.int64).astype(np.int32))
    if width == 1:
        tbl = tbl[:, 0]
    f = jax.jit(lambda t, i: jnp.sum(t[i], dtype=jnp.int32),
                static_argnums=()).lower(tbl, batches_of(1)[0][:786432]
                                         ).compile() if False else None
    g = jax.jit(lambda i, t=tbl: jnp.sum(t[i], dtype=jnp.int32))
    # NOTE: t=tbl default-arg capture == closure constant. Use explicit arg:
    g2 = jax.jit(lambda t, i: jnp.sum(t[i], dtype=jnp.int32))
    for n in (196_608, 786_432):
        bs = batches_of(n)
        timeit(f"arg-table w={width:2d} n={n//1024}K", lambda b: g2(tbl, b),
               bs, n)
    del tbl

# small table elementwise (the v3 word-gather pattern: 18 gathers fused)
gp = jnp.asarray(rng.integers(0, 2**31, 300_000).astype(np.int32))


@jax.jit
def words18(t, i):
    acc = jnp.zeros_like(i)
    for j in range(18):
        acc = acc + t[jnp.clip(i + j, 0, 299_999)]
    return jnp.sum(acc, dtype=jnp.int32)


bs = batches_of(786_432, lim=299_000)
timeit("18 fused elem gathers n=768K (=13.8M idx)",
       lambda b: words18(gp, b), bs, 786_432 * 18)
