"""Cost split of one bench round: dispatch vs d2h vs escalation vs compute."""
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
N_READS = 100_000
BATCH = 32768

rng = np.random.default_rng(12345)
seq = np.concatenate([rng.integers(0, 4, GENOME_LEN).astype(np.uint8),
                      [dna.BASE_EOG]]).astype(np.uint8)
g = Genome(["ecoli_sim"], np.array([0]), np.array([GENOME_LEN]), seq)
idx = SfxIndex.build(g)
recs = simreads.sim_reads(g, simreads.SimParams(
    n_reads=N_READS, read_len=100, seed=7, error_mode="illumina",
    subs_rate=0.02))
reads = np.stack([r.codes for r in recs])
al = kalign.KAligner(idx, batch_size=BATCH)
starts = list(range(0, len(reads) - BATCH + 1, BATCH))

# warm up everything incl. escalation shapes
devs = [al._submit(reads[s:s + BATCH]) for s in starts]
for s, d in zip(starts, devs):
    al._collect_compact(d, reads[s:s + BATCH])

for r in range(3):
    t0 = time.time()
    devs = [al._submit(reads[s:s + BATCH]) for s in starts]
    t_sub = time.time() - t0

    # raw fetches (no escalation)
    t0 = time.time()
    hosts = [np.array(jax.device_get(d)) for d in devs]
    t_fetch = time.time() - t0

    n_ovf = sum(int((h[:, 0] == -3).sum()) for h in hosts)

    # escalation only
    t0 = time.time()
    for s, d, h in zip(starts, devs, hosts):
        pass
    # redo full collect to time escalation+classify (fetch again is cached?
    # no — device_get again; subtract fetch)
    t0 = time.time()
    outs = [al._collect_compact(d, reads[s:s + BATCH])
            for s, d in zip(starts, devs)]
    t_coll = time.time() - t0
    print(f"round {r}: submit {t_sub*1000:6.1f} ms | fetch3x {t_fetch*1000:6.1f} ms"
          f" | collect(fetch+escalate+classify) {t_coll*1000:6.1f} ms"
          f" | ovf reads {n_ovf}", flush=True)

# single megabatch call
mega = reads[:98304]
d = al._submit(mega)
np.array(jax.device_get(d))
for r in range(3):
    t0 = time.time()
    d = al._submit(mega)
    t_sub = time.time() - t0
    t0 = time.time()
    h = np.array(jax.device_get(d))
    t_fetch = time.time() - t0
    print(f"mega  {r}: submit {t_sub*1000:6.1f} ms | fetch {t_fetch*1000:6.1f} ms"
          f" | ovf {int((h[:,0]==-3).sum())}", flush=True)
