"""Honest v3 vs r2 device-rate: unique input per call, block on ALL."""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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
gpack_d = jnp.asarray(gpack.astype(np.uint32))
gbad_d = jnp.asarray(gbad.astype(np.uint32))
gview = F2.make_gview_device(gpack, gbad, nw2)
sa = jnp.asarray(idx.sa_clean.astype(np.int32))
lut = jnp.asarray(idx.lut.astype(np.int32))
G = len(seq)
NC = 24


def dev_rate(name, fn, B, n_uniq=12):
    # n_uniq distinct device-resident batches (rolled copies)
    host = [np.roll(reads, 17 * i, axis=0)[:B] for i in range(n_uniq)]
    batches = [jnp.asarray(h) for h in host]
    float(jnp.sum(fn(batches[0])[:, 0]))
    best = None
    for _ in range(3):
        t0 = time.time()
        outs = [fn(b) for b in batches]
        tot = sum(jnp.sum(o[:, 0]) for o in outs)
        float(tot)          # forced scalar fetch: the only real sync on axon
        dt = (time.time() - t0) / len(outs)
        if best is None or dt < best:
            best = dt
    print(f"{name:40s} {best*1000:8.2f} ms/call  "
          f"{B/best/1e6:6.3f}M r/s", flush=True)


print(f"devices: {jax.devices()}", flush=True)

f3 = functools.partial(F3.fast_pass_compact_v3, gpack_d, gbad_d, sa, lut,
                       genome_len=G, offsets=offsets, lut_k=idx.lut_k,
                       n_compact=NC, max_tot_mm=5, mm_delta=1)
f2 = functools.partial(F2.fast_pass_compact, gview, sa, lut, genome_len=G,
                       offsets=offsets, lut_k=idx.lut_k, n_compact=NC,
                       max_tot_mm=5, mm_delta=1)
dev_rate("v3 compact B=32768 NC=24", lambda b: f3(b), 32768)
dev_rate("r2 compact B=32768 NC=24", lambda b: f2(b), 32768)
dev_rate("v3 compact B=98304 NC=24", lambda b: f3(b), 98304, n_uniq=6)
