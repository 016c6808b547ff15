"""Adaptive NC/NS experiment: v5 fused-pass cost vs tier-1 capacities.

The round-3 ablation attributes the residual v5 compute to two
latency-bound row gathers — lut4 [D,B] (~13 ms) and the [NS,B] genome
extension gather (~18 ms) — plus the O(NC^2) locus-dedup VPU work.  On a
sparse index (config #1: random 4.6 Mbp, ~0.27 suffixes per 12-mer
bucket) the expected candidate total per read is ~D*0.27+1, far below
the fixed NC=24/NS=12, so most gathered extension rows are padding.
This experiment times the same pass at descending (NC, NS) and reports
escalation counts so the host can pick capacities from the bucket
histogram with a bounded tier-2 population (KAligner sizes tier2 E
to keep the leftover-escalation probability negligible).

Protocol: forced-sync via a consuming reduction (block_until_ready does
not synchronise on axon), best of 3 groups of 8 submissions.
"""
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
from kit4b_tpu.ops import seed_extend_v5 as F5
from kit4b_tpu.ops.extend_packed import pack_genome
from kit4b_tpu.align import kalign

GENOME_LEN = 4_600_000
L = 100
B = 98304

rng = np.random.default_rng(12345)
seq = np.concatenate([rng.integers(0, 4, GENOME_LEN).astype(np.uint8),
                      [dna.BASE_EOG]]).astype(np.uint8)
g = Genome(["e"], np.array([0]), np.array([GENOME_LEN]), seq)
idx = SfxIndex.build(g)
recs = simreads.sim_reads(g, simreads.SimParams(
    n_reads=B, read_len=L, seed=7, error_mode="illumina", subs_rate=0.02))
reads = np.stack([r.codes for r in recs])
reads2b, nlist, _ = kalign.pack_reads_2bit(reads)

offsets = F2.fast_offsets(L, idx.lut_k, 5)
nw2 = (L + 15) // 16 + 1
gpack, gbad = pack_genome(seq, 65)
gview = F2.make_gview_device(gpack, gbad, nw2)
sa = jnp.asarray(idx.sa_clean.astype(np.int32))
lut2 = F3.make_lut2_device(idx.lut)
G = len(seq)
print(f"devices: {jax.devices()}", flush=True)
lut4 = F5.make_lut4_device(idx.lut, sa)
_ = int(jax.device_get((lut4[0] & 1).sum()))

r2b_d = jnp.asarray(reads2b)
nl_d = jnp.asarray(nlist)
_ = int(jax.device_get((r2b_d[0, :1]).sum()))


@jax.jit
def consume(outs):
    return sum((o & 1).sum() for o in outs)


def timed(name, fn, n=8):
    out = fn(r2b_d, nl_d)
    _ = int(jax.device_get(consume([out])))
    best = None
    for _ in range(3):
        t0 = time.time()
        outs = [fn(r2b_d, nl_d) for _ in range(n)]
        _ = int(jax.device_get(consume(outs)))
        dt = (time.time() - t0) / n
        best = dt if best is None else min(best, dt)
    print(f"{name:34s} {best*1000:8.2f} ms  {B/best/1e6:6.3f} M reads/s",
          flush=True)
    return out


base = dict(read_len=L, genome_len=G, offsets=offsets, lut_k=idx.lut_k,
            max_tot_mm=5, mm_delta=1)
ref_words = None
VARIANTS = [(24, 12, 512), (16, 8, 512), (16, 8, 2560), (16, 10, 2048),
            (20, 10, 1024), (12, 6, 16384)]
for nc, ns, e2 in VARIANTS:
    f = functools.partial(F5.fast_pass_packed_v5, gview, sa, lut2, lut4,
                          n_compact=nc, n_extend=ns,
                          tier2=(e2, 192, 96), **base)
    o = timed(f"v5 NC={nc} NS={ns} E={e2}", f)
    w = np.asarray(jax.device_get(o))
    code, _, _ = F3.unpack_result2(w)
    n_ovf = int(np.sum(code == -3))
    if ref_words is None:
        ref_words = w
        print(f"    codes: acc={np.sum(code>=0)} ovf={n_ovf}", flush=True)
    else:
        same = (w == ref_words).mean()
        print(f"    agreement vs NC=24: {same*100:.4f}%  leftover_ovf={n_ovf}",
              flush=True)
