"""v3 (lane-major) vs round-2 fast pass: device-rate on the real chip."""
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
REP = 12

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


def dev_rate(name, fn, B, args_fn):
    batches = [args_fn(reads[s:s + B])
               for s in range(0, N_READS - B + 1, B)]
    jax.block_until_ready(fn(batches[0]))
    best = None
    for _ in range(3):
        t0 = time.time()
        outs = [fn(b) for b in batches for _ in range(REP // max(1, len(batches)))]
        jax.block_until_ready(outs[-1])
        dt = (time.time() - t0) / len(outs)
        if best is None or dt < best:
            best = dt
    print(f"{name:40s} {best*1000:8.2f} ms/batch  "
          f"{B/best/1e6:6.2f}M r/s", flush=True)


print(f"devices: {jax.devices()}", flush=True)

for B, NC in ((32768, 24), (98304, 24), (98304, 16)):
    f3 = functools.partial(F3.fast_pass_compact_v3, gpack_d, gbad_d, sa,
                           lut, genome_len=G, offsets=offsets,
                           lut_k=idx.lut_k, n_compact=NC, max_tot_mm=5,
                           mm_delta=1)
    dev_rate(f"v3 compact B={B} NC={NC}",
             lambda b: f3(b), B, lambda r: jnp.asarray(r))

for B, NC in ((32768, 24),):
    f2 = functools.partial(F2.fast_pass_compact, gview, sa, lut,
                           genome_len=G, offsets=offsets,
                           lut_k=idx.lut_k, n_compact=NC, max_tot_mm=5,
                           mm_delta=1)
    dev_rate(f"r2 compact B={B} NC={NC}",
             lambda b: f2(b), B, lambda r: jnp.asarray(r))

# agreement check
out3 = np.asarray(f3(jnp.asarray(reads[:32768])))
f2c = functools.partial(F2.fast_pass_compact, gview, sa, lut, genome_len=G,
                        offsets=offsets, lut_k=idx.lut_k, n_compact=24,
                        max_tot_mm=5, mm_delta=1)
out2 = np.asarray(f2c(jnp.asarray(reads[:32768])))
f3b = functools.partial(F3.fast_pass_compact_v3, gpack_d, gbad_d, sa, lut,
                        genome_len=G, offsets=offsets, lut_k=idx.lut_k,
                        n_compact=24, max_tot_mm=5, mm_delta=1)
out3b = np.asarray(f3b(jnp.asarray(reads[:32768])))
print("v3 == r2 on 32K reads:", bool((out2 == out3b).all()), flush=True)
