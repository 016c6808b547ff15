"""Cost split of one packed-path bench round (B=98304, single call):
host pack / submit / fetch / escalate+classify, plus sub-batch pipelining."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from kit4b_tpu.utils.runtime import enable_compile_cache
enable_compile_cache()
import numpy as np
import jax
import jax.numpy as jnp

from kit4b_tpu import dna
from kit4b_tpu.align import kalign
from kit4b_tpu.index.sfx_index import SfxIndex
from kit4b_tpu.io.fasta import Genome
from kit4b_tpu.sim import simreads

GENOME_LEN = 4_600_000
N = 98304

rng = np.random.default_rng(12345)
seq = np.concatenate([rng.integers(0, 4, GENOME_LEN).astype(np.uint8),
                      [dna.BASE_EOG]]).astype(np.uint8)
g = Genome(["ecoli_sim"], np.array([0]), np.array([GENOME_LEN]), seq)
idx = SfxIndex.build(g)
recs = simreads.sim_reads(g, simreads.SimParams(
    n_reads=100_000, read_len=100, seed=7, error_mode="illumina",
    subs_rate=0.02))
reads = np.stack([r.codes for r in recs])[:N]

for B in (98304, 32768):
    al = kalign.KAligner(idx, batch_size=B)
    starts = list(range(0, N - B + 1, B))
    devs = [al._submit(reads[s:s + B]) for s in starts]
    for s, d in zip(starts, devs):
        al._collect_compact(d, reads[s:s + B])     # warm all shapes
    for r in range(3):
        t0 = time.time()
        t_pack0 = time.time()
        packs = [kalign.pack_reads_2bit(reads[s:s + B]) for s in starts]
        t_pack = time.time() - t_pack0
        t1 = time.time()
        devs = [al._submit(reads[s:s + B]) for s in starts]
        t_sub = time.time() - t1
        t1 = time.time()
        words = [np.array(jax.device_get(d[1])) for d in devs]
        t_fetch = time.time() - t1
        t1 = time.time()
        outs = [al._collect_compact(d, reads[s:s + B])
                for s, d in zip(starts, devs)]
        t_coll = time.time() - t1
        tot = time.time() - t0
        print(f"B={B} r{r}: pack {t_pack*1000:5.1f} | submit(+pack) "
              f"{t_sub*1000:6.1f} | fetch {t_fetch*1000:6.1f} | "
              f"collect+escalate {t_coll*1000:6.1f} | total {tot*1000:6.1f} ms",
              flush=True)
