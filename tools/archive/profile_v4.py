"""v3 (dedup/lane-major/lut2) vs r2 device rate — forced-fetch timing."""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from kit4b_tpu.utils.runtime import enable_compile_cache
enable_compile_cache()
import numpy as np
import jax
import jax.numpy as jnp

from kit4b_tpu import dna
from kit4b_tpu.io.fasta import Genome
from kit4b_tpu.index.sfx_index import SfxIndex
from kit4b_tpu.sim import simreads
from kit4b_tpu.ops import seed_extend_fast as F2
from kit4b_tpu.ops import seed_extend_v3 as F3
from kit4b_tpu.ops.extend_packed import pack_genome

GENOME_LEN = 4_600_000
L = 100
N_READS = 98304

rng = np.random.default_rng(12345)
seq = np.concatenate([rng.integers(0, 4, GENOME_LEN).astype(np.uint8),
                      [dna.BASE_EOG]]).astype(np.uint8)
g = Genome(["e"], np.array([0]), np.array([GENOME_LEN]), seq)
idx = SfxIndex.build(g)
recs = simreads.sim_reads(g, simreads.SimParams(
    n_reads=N_READS, read_len=L, seed=7, error_mode="illumina",
    subs_rate=0.02))
reads = np.stack([r.codes for r in recs])

offsets = F2.fast_offsets(L, idx.lut_k, 5)
nw2 = (L + 15) // 16 + 1
gpack, gbad = pack_genome(seq, 65)
gview = F2.make_gview_device(gpack, gbad, nw2)
sa = jnp.asarray(idx.sa_clean.astype(np.int32))
lut = jnp.asarray(idx.lut.astype(np.int32))
lut2 = F3.make_lut2_device(idx.lut)
G = len(seq)


def dev_rate(name, fn, B, n_uniq=10):
    host = [np.roll(reads, 977 * i, axis=0)[:B] for i in range(n_uniq)]
    batches = [jnp.asarray(h) for h in host]
    out0 = fn(batches[0])
    float(jnp.sum(out0[:, 0]))
    best = None
    for _ in range(3):
        t0 = time.time()
        outs = [fn(b) for b in batches]
        tot = sum(jnp.sum(o[:, 0]) for o in outs)
        float(tot)
        dt = (time.time() - t0) / len(batches)
        if best is None or dt < best:
            best = dt
    print(f"{name:44s} {best*1000:8.2f} ms/call  "
          f"{B/best/1e6:6.3f}M r/s", flush=True)
    # sanity: overflow rate
    o = np.asarray(out0)
    print(f"    codes: acc={np.sum(o[:,0]>=0)} no={np.sum(o[:,0]==-1)} "
          f"mu={np.sum(o[:,0]==-2)} ovf={np.sum(o[:,0]==-3)}", flush=True)


print(f"devices: {jax.devices()}", flush=True)

for B, NC, NS in ((32768, 24, 8), (32768, 16, 8), (98304, 24, 8),
                  (98304, 24, 12)):
    f3 = functools.partial(F3.fast_pass_compact_v3, gview, sa, lut2,
                           genome_len=G, offsets=offsets, lut_k=idx.lut_k,
                           n_compact=NC, n_extend=NS, max_tot_mm=5,
                           mm_delta=1)
    dev_rate(f"v3 B={B} NC={NC} NS={NS}", lambda b: f3(b), B)

f2 = functools.partial(F2.fast_pass_compact, gview, sa, lut, genome_len=G,
                       offsets=offsets, lut_k=idx.lut_k, n_compact=24,
                       max_tot_mm=5, mm_delta=1)
dev_rate("r2 B=32768 NC=24", lambda b: f2(b), 32768)
