"""fast_pass throughput vs batch size, serial and pipelined (axon tunnel
has ~25ms fixed per-call dispatch overhead — find the sweet spot)."""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from kit4b_tpu import dna
from kit4b_tpu.io.fasta import Genome
from kit4b_tpu.index.sfx_index import SfxIndex
from kit4b_tpu.sim import simreads
from kit4b_tpu.ops import seed_extend_fast as F
from kit4b_tpu.ops.extend_packed import pack_genome

GENOME_LEN = 4_600_000
L = 100
NC = 24

rng = np.random.default_rng(12345)
seq = np.concatenate([rng.integers(0, 4, GENOME_LEN).astype(np.uint8),
                      [dna.BASE_EOG]]).astype(np.uint8)
g = Genome(["e"], np.array([0]), np.array([GENOME_LEN]), seq)
idx = SfxIndex.build(g)
recs = simreads.sim_reads(g, simreads.SimParams(
    n_reads=98304, read_len=L, seed=7, error_mode="illumina",
    subs_rate=0.02))
reads = np.stack([r.codes for r in recs])

offsets = F.fast_offsets(L, idx.lut_k, 5)
nw2 = (L + 15) // 16 + 1
gpack, gbad = pack_genome(seq, 65)
gview = jnp.asarray(F.make_gview(gpack, gbad, nw2))
sa = jnp.asarray(idx.sa_clean.astype(np.int32))
lut = jnp.asarray(idx.lut.astype(np.int32))

for B in (8192, 16384, 32768):
    fn = functools.partial(F.fast_pass, genome_len=len(seq),
                           offsets=offsets, lut_k=idx.lut_k,
                           n_compact=NC, max_ml=5)
    batches = [jnp.asarray(reads[s:s + B])
               for s in range(0, len(reads) - B + 1, B)]
    out = jax.block_until_ready(fn(gview, sa, lut, batches[0]))  # compile
    # serial
    t0 = time.time()
    for b in batches:
        out = fn(gview, sa, lut, b)
        jax.block_until_ready(out)
    dt = time.time() - t0
    ser = len(batches) * B / dt
    # pipelined: submit all, then fetch
    t0 = time.time()
    outs = [fn(gview, sa, lut, b) for b in batches]
    res = [jax.device_get(o) for o in outs]
    dt2 = time.time() - t0
    pip = len(batches) * B / dt2
    novf = sum(int(r["overflow"].sum()) for r in res)
    print(f"B={B:6d} serial {dt/len(batches)*1000:7.1f} ms/batch = "
          f"{ser/1000:6.0f}K r/s | pipelined {pip/1000:6.0f}K r/s | "
          f"overflow {novf}", flush=True)
