"""Can a Pallas kernel beat XLA's ~10ns/index gather floor when the table
is VMEM-resident?  Tests jnp.take lowering inside a TPU kernel."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 262_144          # table entries (1MB uint32) — fits VMEM
N = 524_288          # indices
TILE = 8192

rng = np.random.default_rng(0)
table = jnp.asarray(rng.integers(0, 2**31, T).astype(np.int32))
idx = jnp.asarray(rng.integers(0, T, N).astype(np.int32))


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    outs = [fn(*args) for _ in range(10)]
    jax.block_until_ready(outs[-1])
    dt = (time.time() - t0) / 10
    print(f"{name:40s} {dt*1000:8.2f} ms  ({dt/N*1e9:.2f} ns/idx)",
          flush=True)
    return out


@jax.jit
def xla_gather(t, i):
    return t[i]


def kernel_take(t_ref, i_ref, o_ref):
    o_ref[:] = jnp.take(t_ref[:], i_ref[:], axis=0)


@jax.jit
def pallas_take(t, i):
    return pl.pallas_call(
        kernel_take,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.int32),
        grid=(N // TILE,),
        in_specs=[pl.BlockSpec((T,), lambda k: (0,),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((TILE,), lambda k: (k,),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE,), lambda k: (k,),
                               memory_space=pltpu.VMEM),
    )(t, i)


def kernel_take2d(t_ref, i_ref, o_ref):
    # 2D formulation: table as [T//128, 128]; idx row/col split
    o_ref[:] = jnp.take(t_ref[:].reshape(-1), i_ref[:], axis=0)


print(f"devices: {jax.devices()}", flush=True)
timeit("xla gather [524K] from [262K]", xla_gather, table, idx)
try:
    r_p = timeit("pallas jnp.take VMEM table", pallas_take, table, idx)
    r_x = xla_gather(table, idx)
    print("match:", bool(jnp.array_equal(r_p, r_x)), flush=True)
except Exception as e:
    print(f"pallas take failed: {type(e).__name__}: {e}", flush=True)
