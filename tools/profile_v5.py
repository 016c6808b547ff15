"""v5 (flattened lut4 index) vs v4 fused-pass timing on the real chip.

Forced-sync protocol: block_until_ready does not synchronise on the axon
platform, so each timed group of 8 submissions is completed by fetching a
scalar reduction that consumes every output.
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
from kit4b_tpu.ops import seed_extend_v4 as F4
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
print(f"escalation estimate: "
      f"{F5.host_escalation_estimate(idx.lut, len(offsets)):.2e}",
      flush=True)

t0 = time.time()
lut4 = F5.make_lut4_device(idx.lut, sa)
_ = int(jax.device_get((lut4[0] & 1).sum()))
print(f"lut4 build (device): {time.time()-t0:.2f}s "
      f"({lut4.nbytes/1e6:.0f} MB)", flush=True)

r2b_d = jnp.asarray(reads2b)
nl_d = jnp.asarray(nlist)
_ = int(jax.device_get((r2b_d[0, :1]).sum()))

kw = dict(read_len=L, genome_len=G, offsets=offsets, lut_k=idx.lut_k,
          n_compact=24, n_extend=12, max_tot_mm=5, mm_delta=1)
f4 = functools.partial(F4.fast_pass_packed_v4, gview, sa, lut2, **kw)
f5 = functools.partial(F5.fast_pass_packed_v5, gview, sa, lut2, lut4, **kw)


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


o4 = timed("v4 fused pass", f4)
o5 = timed("v5 fused pass (lut4)", f5)
w4 = np.asarray(jax.device_get(o4))
w5 = np.asarray(jax.device_get(o5))
same = (w4 == w5).mean()
print(f"agreement v4 vs v5 on chip: {same*100:.4f}%", flush=True)
code5, _, _ = F3.unpack_result2(w5)
print(f"v5 codes: acc={np.sum(code5>=0)} no={np.sum(code5==-1)} "
      f"mu={np.sum(code5==-2)} ovf={np.sum(code5==-3)}", flush=True)
